"""Text-analysis operator tests over the driver's documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_only_importer_prototype_spark.operators import text as text_ops


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_token_count_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    rows = docs.select("doc_id", "text").collect()
    got = {
        r.doc_id: r.n_tokens
        for r in docs.select(
            "doc_id", text_ops.token_count(F.col("text")).alias("n_tokens")
        ).collect()
    }
    for r in rows:
        assert got[r.doc_id] == len(r.text.split()), r.doc_id


def test_token_count_edge_cases(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "one"), (3, "a  b\t c\nd")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", text_ops.token_count(F.col("text")).alias("n")
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 4}


def test_quality_features_no_nulls_and_ranges(spark, sf_dir):
    feats = text_ops.quality_features(_docs(spark, sf_dir)).collect()
    assert len(feats) > 0
    for r in feats:
        assert r.n_chars > 0
        assert 0 <= r.punct_per_1000_chars <= 1000
        assert r.n_tokens <= r.n_pieces  # pieces split punctuation too
        assert all(v is not None for v in r)


def test_language_id_deterministic_and_scored(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out1 = sorted(map(tuple, text_ops.language_id(docs).collect()))
    out2 = sorted(map(tuple, text_ops.language_id(docs).collect()))
    assert out1 == out2
    langs = {t[1] for t in out1}
    assert langs <= set(text_ops.LANG_MARKERS) | {"unknown"}


def test_fingerprint_is_md5_of_normalized(spark):
    import hashlib

    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, "different")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.fingerprint for r in text_ops.fingerprint(df).collect()}
    expected = hashlib.md5(b"hello world").hexdigest()
    assert rows[0] == expected == rows[1]
    assert rows[2] != expected


def test_shingles_window(spark):
    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    got = sorted(r.shingle for r in text_ops.shingles(df, n=3).collect())
    assert got == ["a b c", "b c d"]
    # short doc -> no shingles
    short = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    assert text_ops.shingles(short, n=3).count() == 0


def test_winnow_fingerprint_properties(spark):
    from clickhouse_only_importer_prototype_spark.operators.text import (
        winnow_fingerprints,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    edited = base.replace("lazy", "sleepy")  # one-token local edit
    rows = [(0, base), (1, base), (2, edited), (3, "too short")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=4, w=5)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # identical docs -> identical fingerprint sets
    assert by_doc[0] == by_doc[1]
    # a local edit keeps some fingerprints (position-robust) but not all
    assert by_doc[0] & by_doc[2]
    assert by_doc[0] != by_doc[2]
    # short doc falls back to a single whole-text fingerprint
    assert len(by_doc[3]) == 1


# Pure-Python XXH64 (Collet's public-domain algorithm) — the replay
# oracle for winnow_fingerprint_fast: Spark's xxhash64(string) is
# XXH64 seed=42 over the UTF-8 bytes (verified bit-exact incl. empty /
# multi-byte / >32-byte inputs), and DuckDB has no xxhash64, so the
# rows-only registered query gets its value gate here instead.
_XXH_MASK = (1 << 64) - 1
_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _XXH_MASK


def _xxh64(data: bytes, seed: int = 42) -> int:
    n, i = len(data), 0
    if n >= 32:
        v = [
            (seed + _XXH_P1 + _XXH_P2) & _XXH_MASK,
            (seed + _XXH_P2) & _XXH_MASK,
            seed & _XXH_MASK,
            (seed - _XXH_P1) & _XXH_MASK,
        ]
        while i + 32 <= n:
            for k in range(4):
                lane = int.from_bytes(data[i + 8 * k : i + 8 * k + 8], "little")
                v[k] = (
                    _rotl64((v[k] + lane * _XXH_P2) & _XXH_MASK, 31) * _XXH_P1
                ) & _XXH_MASK
            i += 32
        h = (
            _rotl64(v[0], 1) + _rotl64(v[1], 7)
            + _rotl64(v[2], 12) + _rotl64(v[3], 18)
        ) & _XXH_MASK
        for vk in v:
            h ^= (_rotl64((vk * _XXH_P2) & _XXH_MASK, 31) * _XXH_P1) & _XXH_MASK
            h = ((h * _XXH_P1) + _XXH_P4) & _XXH_MASK
    else:
        h = (seed + _XXH_P5) & _XXH_MASK
    h = (h + n) & _XXH_MASK
    while i + 8 <= n:
        lane = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl64((lane * _XXH_P2) & _XXH_MASK, 31) * _XXH_P1) & _XXH_MASK
        h = ((_rotl64(h, 27) * _XXH_P1) + _XXH_P4) & _XXH_MASK
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h ^= (lane * _XXH_P1) & _XXH_MASK
        h = ((_rotl64(h, 23) * _XXH_P2) + _XXH_P3) & _XXH_MASK
        i += 4
    while i < n:
        h ^= (data[i] * _XXH_P5) & _XXH_MASK
        h = (_rotl64(h, 11) * _XXH_P1) & _XXH_MASK
        i += 1
    h ^= h >> 33
    h = (h * _XXH_P2) & _XXH_MASK
    h ^= h >> 29
    h = (h * _XXH_P3) & _XXH_MASK
    h ^= h >> 32
    return h


def _xxh64_signed(s: str) -> int:
    h = _xxh64(s.encode("utf-8"))
    return h - (1 << 64) if h >= (1 << 63) else h


def _winnow_replay(text: str, k: int = 4, w: int = 5) -> set[int]:
    """Python replay of text.winnow_fingerprints(hash_fn='xxhash64')."""
    import re

    norm = re.sub(r"\s+", " ", text.lower()).strip()
    toks = norm.split(" ")
    if len(toks) >= k:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    else:
        grams = [norm]
    hs = [_xxh64_signed(g) for g in grams]
    if len(hs) >= w:
        wins = [min(hs[j : j + w]) for j in range(len(hs) - w + 1)]
    else:
        wins = [min(hs)]
    return set(wins)


def test_spark_xxhash64_is_xxh64_seed42(spark):
    """Pin the replay's foundation: Spark's xxhash64 over strings is
    XXH64 seed=42 on UTF-8 bytes — empty, short, 4/8-byte-tail, >32
    byte (vector loop), and multi-byte-codepoint inputs."""
    vals = ["", "a", "abcd", "abcdefgh", "hello world",
            "the quick brown fox jumps over the lazy dog and more",
            "é ü 漢字", "x" * 100]
    got = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", F.xxhash64("s").alias("h")
    ).collect()
    for r in got:
        assert r.h == _xxh64_signed(r.s), repr(r.s)


def test_winnow_xxhash64_replay(spark, sf_dir):
    """Value gate for winnow_fingerprint_fast (rows-only at the
    driver): the full winnowing pipeline under the xxhash64 digest
    matches a pure-Python replay fingerprint-set-for-fingerprint-set
    over real corpus documents plus the short-doc fallback edge."""
    docs = _docs(spark, sf_dir).limit(40)
    extra = spark.createDataFrame(
        [(100001, "too short"), (100002, ""), (100003, "a  B\t c\nd e f")],
        "doc_id long, text string",
    )
    df = docs.select("doc_id", "text").unionByName(extra)
    texts = {r.doc_id: r.text for r in df.collect()}
    fps = text_ops.winnow_fingerprints(df, k=4, w=5, hash_fn="xxhash64")
    by_doc: dict[int, set[int]] = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert set(by_doc) == set(texts)
    for doc_id, text in texts.items():
        assert by_doc[doc_id] == _winnow_replay(text), doc_id


def test_redact_pii(spark):
    from clickhouse_only_importer_prototype_spark.operators.text import redact_pii

    rows = [
        (0, "mail me at alice.smith+x@example.co.uk or call +1 (555) 123-4567"),
        (1, "see https://example.com/a?b=1 and http://x.io"),
        (2, "clean text with no identifiers"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    assert got[0].n_email == 1 and got[0].n_phone == 1
    assert "<EMAIL>" in got[0].redacted and "<PHONE>" in got[0].redacted
    assert "alice" not in got[0].redacted and "555" not in got[0].redacted
    assert got[1].n_url == 2 and got[1].redacted.count("<URL>") == 2
    assert got[2].redacted == rows[2][1]
    assert (got[2].n_email, got[2].n_url, got[2].n_phone) == (0, 0, 0)


def test_redact_pii_counts_match_placeholders(spark):
    """Counts are taken on the progressively-redacted string: a span
    swallowed by an earlier replacement never counts, so each n_* equals
    the number of its placeholders in `redacted`."""
    from clickhouse_only_importer_prototype_spark.operators.text import redact_pii

    rows = [
        # phone-like digit run inside a URL: swallowed by <URL>
        (0, "grab https://cdn.example.com/+1555123456789/file.bin today"),
        # digits AFTER the url whitespace-boundary: still a phone
        (1, "visit https://example.com then dial +1 555 123 4567 ok"),
        # email whose local part looks phone-ish: swallowed by <EMAIL>
        (2, "contact 15551234567@pager.example.com for help"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    for r in got.values():
        assert r.n_email == r.redacted.count("<EMAIL>")
        assert r.n_url == r.redacted.count("<URL>")
        assert r.n_phone == r.redacted.count("<PHONE>")
    assert (got[0].n_url, got[0].n_phone) == (1, 0)
    assert (got[1].n_url, got[1].n_phone) == (1, 1)
    assert (got[2].n_email, got[2].n_phone) == (1, 0)


def test_repetition_features(spark):
    from clickhouse_only_importer_prototype_spark.operators.text import (
        repetition_features,
    )

    rows = [
        (0, "spam spam spam spam spam spam"),       # fully repetitive
        (1, "one two three four five six seven"),   # no repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_features(df, n=3).collect()}
    # doc 0: 4 trigrams, all identical -> 3/4 duplicated; top token 6/6
    assert got[0].n_grams == 4 and got[0].n_distinct_grams == 1
    assert got[0].dup_gram_per_1000 == 750
    assert got[0].top_token_per_1000 == 1000
    # doc 1: 5 distinct trigrams, each token once
    assert got[1].dup_gram_per_1000 == 0
    assert got[1].top_token_per_1000 == 1000 // 7 * 1 or got[1].top_token_per_1000 == 142


def test_profile_table_exact_and_approx(spark, sf_dir):
    from clickhouse_only_importer_prototype_spark.operators.profile import (
        profile_table,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = {r.column: r for r in profile_table(docs, ["doc_id", "lang"]).collect()}
    n = docs.count()
    assert prof["doc_id"].n_rows == n and prof["doc_id"].n_null == 0
    assert prof["doc_id"].n_distinct == n  # primary key
    assert prof["lang"].n_distinct == docs.select("lang").distinct().count()
    # approx mode: within HLL tolerance of exact
    aprof = {
        r.column: r
        for r in profile_table(docs, ["doc_id", "lang"], approx=True).collect()
    }
    assert abs(aprof["doc_id"].n_distinct - n) <= 0.1 * n
    import pytest as _pytest

    with _pytest.raises(ValueError, match="columns not in"):
        profile_table(docs, ["nope"])


def test_rarity_top_terms_rank_and_ties(spark):
    from clickhouse_only_importer_prototype_spark.operators.text import (
        rarity_top_terms,
    )

    rows = [
        (1, "zebra zebra common"),
        (2, "common common apple"),
        (3, "common apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.doc_id, r.rank): (r.term, r.tf, r.doc_freq, r.score_1e6)
        for r in rarity_top_terms(df, k=2).collect()
    }
    # doc 1: zebra tf=2 df=1 -> 2_000_000 beats common tf=1 df=3
    assert out[(1, 1)] == ("zebra", 2, 1, 2_000_000)
    assert out[(1, 2)] == ("common", 1, 3, 333_333)
    # doc 3: apple (df=2) outscores common (df=3); both tf=1
    assert out[(3, 1)][0] == "apple" and out[(3, 1)][3] == 500_000


def test_rarity_top_terms_paths_equal(spark, sf_dir):
    """The broadcast-map path (vocab fits) and the exploded-window
    fallback (vocab past the gate) must return identical rows — the
    gate decides cost, never output (forced by broadcast_vocab_max=0
    on the same corpus; exercises empty docs and rank ties too)."""
    from clickhouse_only_importer_prototype_spark.operators.text import (
        rarity_top_terms,
    )

    docs = _docs(spark, sf_dir).limit(60).select("doc_id", "text")
    extra = spark.createDataFrame(
        [(900001, ""), (900002, "solo"), (900003, "tie tie bie bie")],
        "doc_id long, text string",
    )
    df = docs.unionByName(extra)
    fast = {tuple(r) for r in rarity_top_terms(df, k=3).collect()}
    slow = {
        tuple(r)
        for r in rarity_top_terms(df, k=3, broadcast_vocab_max=0).collect()
    }
    assert fast == slow
    assert not any(r[0] == 900001 for r in fast)  # empty doc absent


def test_chunk_documents_overlap_and_tail(spark):
    from clickhouse_only_importer_prototype_spark.operators.text import (
        chunk_documents,
    )

    text = " ".join(f"t{i}" for i in range(50))
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    rows = sorted(
        chunk_documents(df, chunk_size=32, stride=24).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["start"] for r in rows] == [0, 24, 48]
    assert [r["n_tokens"] for r in rows] == [32, 26, 2]
    assert rows[0]["chunk_text"].split(" ")[:2] == ["t0", "t1"]
    # overlap: chunk 1 starts 8 tokens before chunk 0 ends
    assert rows[1]["chunk_text"].split(" ")[0] == "t24"
    assert rows[2]["chunk_text"] == "t48 t49"


def test_chunk_documents_short_and_empty(spark):
    from clickhouse_only_importer_prototype_spark.operators.text import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, "")], "doc_id: long, text: string"
    )
    rows = chunk_documents(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_tokens"] == 3
    # split("") -> [""]: one chunk of the single empty token
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 1
    assert by_doc[2][0]["chunk_text"] == ""


def test_chunk_documents_validates(spark):
    import pytest

    from clickhouse_only_importer_prototype_spark.operators.text import (
        chunk_documents,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)


# ---------------------------------------------------------------- BPE


def _bpe_reference(word_counts, n_merges):
    """Canonical BPE trainer: greedy-leftmost non-overlapping merges,
    argmax by (count desc, pair asc)."""
    states = {tuple(w): n for w, n in word_counts.items()}
    rules = []
    for step in range(1, n_merges + 1):
        counts = {}
        for syms, n in states.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + n
                )
        # tie-break on the concatenated 'a|b' rendering — the SAME key
        # the product orders on (tuple order would disagree when one
        # pair's left symbol is a prefix of another's)
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + "|" + kv[0][1])
        )
        rules.append((step, a, b, c))
        new_states = {}
        for syms, n in states.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_states[key] = new_states.get(key, 0) + n
        states = new_states
    return rules


def test_bpe_train_matches_reference_incl_self_pair_runs(spark):
    # 'aaaaaa' exercises the odd/even self-pair overlap rule where
    # greedy implementations commonly diverge.
    wc = {"aaaaaa": 3, "the": 2, "then": 2, "t": 1, "ababab": 1}
    df = spark.createDataFrame(list(wc.items()), "word string, n long")
    got = [tuple(r) for r in text_ops.bpe_train(df, 4).collect()]
    assert got == _bpe_reference(wc, 4)


def test_bpe_merge_fold_is_greedy_leftmost(spark):
    df = spark.createDataFrame([("aaa", 1), ("aaaa", 1)], "word string, n long")
    states = text_ops.bpe_word_states(df)
    best = spark.createDataFrame(
        [("a", "a", 0)], "left_sym string, right_sym string, pair_count long"
    )
    got = sorted(
        r.state for r in text_ops.bpe_apply_merge(states, best).collect()
    )
    # 'a a a' -> 'aa a' (non-overlapping leftmost); 'a a a a' -> 'aa aa'
    assert got == ["/aa/a/", "/aa/aa/"]


def test_bpe_pair_counts_single_symbol_words(spark):
    df = spark.createDataFrame([("a", 5), ("bc", 2)], "word string, n long")
    got = {
        r.pair: r.pair_count
        for r in text_ops.bpe_pair_counts(
            text_ops.bpe_word_states(df)
        ).collect()
    }
    assert got == {"b|c": 2}


def test_bpe_encode_token_counts(spark):
    # merges learned on this corpus: ('a','a') dominates; verify the
    # final segmentation token counts against the python reference
    wc = {"aaaa": 5, "ab": 3, "b": 2}
    df = spark.createDataFrame(list(wc.items()), "word string, n long")
    got = {
        r.word: (r.state, r.n_tokens)
        for r in text_ops.bpe_encode(df, 2).collect()
    }
    rules = _bpe_reference(wc, 2)
    # replay reference apply
    states = {w: list(w) for w in wc}
    for _, a, b, _c in rules:
        for w, syms in states.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            states[w] = out
    for w, syms in states.items():
        assert got[w] == ("/" + "/".join(syms) + "/", len(syms)), w


def test_bpe_distributed_path_equals_local(spark, monkeypatch):
    wc = {"aaaaaa": 3, "the": 2, "then": 2, "t": 1, "ababab": 1}
    df = spark.createDataFrame(list(wc.items()), "word string, n long")
    local_rules = [tuple(r) for r in text_ops.bpe_train(df, 3).collect()]
    local_enc = sorted(
        tuple(r) for r in text_ops.bpe_encode(df, 3).collect()
    )
    monkeypatch.setattr(text_ops, "LOCAL_VOCAB_MAX", -1)
    dist_rules = [tuple(r) for r in text_ops.bpe_train(df, 3).collect()]
    dist_enc = sorted(
        tuple(r) for r in text_ops.bpe_encode(df, 3).collect()
    )
    assert dist_rules == local_rules == _bpe_reference(wc, 3)
    assert dist_enc == local_enc


def test_bpe_excludes_delimiter_bearing_words(spark):
    # 'a/b' and 'x|y' must not vote on merges or corrupt states
    wc = {"the": 5, "then": 3, "a/b": 100, "x|y": 100}
    df = spark.createDataFrame(list(wc.items()), "word string, n long")
    got = [tuple(r) for r in text_ops.bpe_train(df, 2).collect()]
    clean = {w: n for w, n in wc.items() if "/" not in w and "|" not in w}
    assert got == _bpe_reference(clean, 2)
    enc_words = {r.word for r in text_ops.bpe_encode(df, 2).collect()}
    assert enc_words == set(clean)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_dup_spans_cross_doc_only(spark):
    # A 4-token span shared by docs 0 and 1; doc 2 repeats its own
    # span twice but shares it with nobody -> within-doc repetition is
    # NOT a duplicated span (that's repetition_features' contract).
    shared = "alpha beta gamma delta"
    df = _docs(
        spark,
        [
            f"x1 x2 {shared} x3",
            f"y1 {shared}",
            "p q r s p q r s",  # 8 tokens, own 4-gram repeats twice
        ],
    )
    got = {
        r.span_hash: r
        for r in text_ops.dup_spans(df, n=4, min_docs=2).collect()
    }
    # every window of doc2 appears once in one doc except "p q r s"
    # (twice, same doc) -> nothing from doc2 qualifies
    import hashlib

    h = hashlib.md5(shared.encode()).hexdigest()
    assert h in got
    assert got[h].n_docs == 2 and got[h].n_occurrences == 2
    assert got[h].first_doc == 0
    # doc2's repeated span must not appear
    h2 = hashlib.md5(b"p q r s").hexdigest()
    assert h2 not in got


def test_dup_spans_counts_within_doc_repeats_of_shared_span(spark):
    # span appears twice in doc 0 and once in doc 1: n_occurrences=3
    s = "a b c d"
    df = _docs(spark, [f"{s} zz {s}", f"qq {s}"])
    import hashlib

    h = hashlib.md5(s.encode()).hexdigest()
    got = {
        r.span_hash: r
        for r in text_ops.dup_spans(df, n=4, min_docs=2).collect()
    }
    assert got[h].n_occurrences == 3 and got[h].n_docs == 2


def test_dup_span_coverage_islands_merge(spark):
    # docs 0/1 share a 6-token run; with n=4 that is 3 overlapping
    # windows per doc -> ONE island covering exactly 6 tokens, never
    # 3*4=12. Doc 2 is unique (coverage 0); doc 3 is shorter than n
    # (no windows at all, coverage 0).
    run = "m1 m2 m3 m4 m5 m6"
    df = _docs(
        spark,
        [
            f"u1 u2 {run} u3 u4",  # 10 tokens, 6 covered
            f"{run} v1",  # 7 tokens, 6 covered
            "w1 w2 w3 w4 w5 w6 w7 w8",  # unique
            "s1 s2 s3",  # shorter than n
        ],
    )
    got = {
        r.doc_id: r
        for r in text_ops.dup_span_coverage(df, n=4, min_docs=2).collect()
    }
    assert len(got) == 4  # one row per document, always
    assert (got[0].n_tokens, got[0].covered_tokens) == (10, 6)
    assert got[0].coverage_1e6 == 600000
    assert (got[1].n_tokens, got[1].covered_tokens) == (7, 6)
    assert got[1].coverage_1e6 == 6 * 1000000 // 7
    assert got[2].covered_tokens == 0 and got[2].coverage_1e6 == 0
    assert (got[3].n_tokens, got[3].covered_tokens) == (3, 0)


def test_dup_span_coverage_disjoint_islands(spark):
    # two shared runs separated by unique text -> two islands whose
    # lengths ADD; fully duplicated doc -> coverage exactly 1e6
    r1, r2 = "a1 a2 a3 a4", "b1 b2 b3 b4"
    df = _docs(
        spark,
        [
            f"{r1} zz1 zz2 {r2}",  # 10 tokens, 4+4 covered
            f"{r1} qq1 qq2 {r2}",  # same runs, different middle
            r1,  # 4 tokens, fully covered
        ],
    )
    got = {
        r.doc_id: r
        for r in text_ops.dup_span_coverage(df, n=4, min_docs=2).collect()
    }
    assert (got[0].n_tokens, got[0].covered_tokens) == (10, 8)
    assert got[2].coverage_1e6 == 1000000


def test_dup_span_strip_removes_all_occurrences(spark):
    run = "m1 m2 m3 m4 m5 m6"
    df = _docs(
        spark,
        [
            f"u1 u2 {run} u3 u4",
            f"{run} v1",
            "w1 w2 w3 w4",  # untouched
            "s1",  # shorter than n
        ],
    )
    got = {
        r.doc_id: r
        for r in text_ops.dup_span_strip(df, n=4, min_docs=2).collect()
    }
    assert got[0].clean_text == "u1 u2 u3 u4"
    assert (got[0].n_tokens, got[0].removed_tokens) == (10, 6)
    assert got[1].clean_text == "v1" and got[1].removed_tokens == 6
    assert got[2].clean_text == "w1 w2 w3 w4" and got[2].removed_tokens == 0
    assert got[3].clean_text == "s1" and got[3].removed_tokens == 0


def test_dup_span_strip_fully_duplicated_doc_empties(spark):
    s = "a b c d e"
    df = _docs(spark, [s, s, f"zz {s} qq"])
    got = {
        r.doc_id: r
        for r in text_ops.dup_span_strip(df, n=5, min_docs=2).collect()
    }
    assert got[0].clean_text == "" and got[0].removed_tokens == 5
    assert got[1].clean_text == ""
    assert got[2].clean_text == "zz qq" and got[2].removed_tokens == 5


def test_dup_span_strip_consistent_with_coverage(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        "doc_id < 200"
    )
    strip = {
        r.doc_id: r for r in text_ops.dup_span_strip(docs, n=12).collect()
    }
    cov = {
        r.doc_id: r
        for r in text_ops.dup_span_coverage(docs, n=12).collect()
    }
    assert set(strip) == set(cov)
    for d, r in strip.items():
        assert r.removed_tokens == cov[d].covered_tokens, d


def test_dup_span_family_collapse_paths_equal(spark, sf_dir):
    # dup-heavy corpus: real docs replicated 3x with shifted ids (the
    # verbatim-copy shape the collapse exists for), plus a whitespace/
    # case variant that must land in the same normalized-text group
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id < 60")
        .select("doc_id", "text")
    )
    from pyspark.sql import functions as F

    copies = base
    for i in (1, 2):
        copies = copies.unionByName(
            base.select(
                (F.col("doc_id") + 100000 * i).alias("doc_id"), "text"
            )
        )
    variant = base.where("doc_id < 5").select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.upper(F.concat(F.lit("  "), F.col("text"))).alias("text"),
    )
    df = copies.unionByName(variant)
    for fn in (
        text_ops.dup_spans,
        text_ops.dup_span_coverage,
        text_ops.dup_span_strip,
    ):
        plain = sorted(
            tuple(r) for r in fn(df, n=12, collapse=False).collect()
        )
        coll = sorted(
            tuple(r) for r in fn(df, n=12, collapse=True).collect()
        )
        assert plain == coll, fn.__name__
        # the probe must choose collapse on this 2/3-duplicate corpus
    assert text_ops._probe_span_collapse(df, "text") is True


def test_unpersist_span_stats_releases_handles(spark, sf_dir):
    from clickhouse_only_importer_prototype_spark.operators import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        "doc_id < 50"
    ).select("doc_id", "text")
    t.unpersist_span_stats()  # clean slate
    stats, _ = t._span_text_groups(docs, "text")
    stats.count()
    assert stats.storageLevel.useMemory
    assert t.unpersist_span_stats() == 1
    assert not stats.storageLevel.useMemory
    assert t.unpersist_span_stats() == 0  # idempotent
