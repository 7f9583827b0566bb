"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language-ID,
quality scoring, token counting, document fingerprinting. Everything
here is a row-local projection built from JVM-side
``pyspark.sql.functions`` — no UDFs, no shuffle, whole-stage codegen
end-to-end — so at 100 TB these run at scan speed.

Cross-engine determinism: each op is also expressible in ANSI/DuckDB
SQL (see __spark_entry__.oracle_sql). To keep hashes identical we use
only constructs with identical semantics in both engines: non-regex
``replace`` for marker counting, explicit character classes for
punctuation, md5 for fingerprints, integer arithmetic where rounding
could diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from clickhouse_only_importer_prototype_spark.localframe import arrow_local_df

# Per-language marker words for the n-gram/stopword heuristic. Counting
# uses non-regex replace => identical in Spark and DuckDB.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of"],
    "de": ["der", "und", "die", "nicht"],
    "fr": ["le", "et", "les", "une"],
    "es": ["el", "y", "los", "una"],
    "zh": ["de", "shi", "zai", "le"],
}

PUNCT_CLASS = "[.,;:!?]"

# BPE-ish word piece: word chars, or a single non-space symbol.
TOKEN_REGEX = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"


def _norm(col: Column) -> Column:
    """lower + collapse whitespace + trim — shared normalization."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def marker_count(toks: Column, markers: list[str]) -> Column:
    """Count of tokens equal to any marker — one pass over the token
    array, lambda touches only its variable (HOF discipline). DuckDB
    twin: len(list_filter(toks, x -> x IN (...))). Token-exact, so
    consecutive duplicate markers count correctly (the padded-replace
    trick undercounts those and costs a full string traversal per
    marker)."""
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.isin(*markers).cast("long"),
    )


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank text -> 0."""
    t = _norm(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " "))).cast("long")


def wordpiece_count(col: Column) -> Column:
    """BPE-ish piece count: words plus isolated symbols (TOKEN_REGEX).
    NULL text stays NULL (matching every sibling feature and the SQL
    oracle's regexp_extract_all semantics); empty text counts 0."""
    return F.regexp_count(col, F.lit(TOKEN_REGEX)).cast("long")


def punct_count(col: Column) -> Column:
    return (
        F.length(col) - F.length(F.regexp_replace(col, PUNCT_CLASS, ""))
    ).cast("long")


def quality_features(
    df: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Quality-scoring features per document (length / punctuation /
    stopword / word-shape ratios). Ratios are int-scaled per-1000 longs
    to keep cross-engine hashes exact (no float division drift).

    ``keep`` passes named input columns through the projection so
    pipelines can fuse downstream keys (source, fingerprints) into the
    single text pass instead of re-deriving them and paying a doc_id
    self-join — the language_expr fusion pattern. Names must not
    collide with the feature columns.
    """
    c = F.col(text_col)
    n_chars = F.length(c).cast("long")
    n_tokens = token_count(c)
    n_punct = punct_count(c)
    n_stop = marker_count(F.split(_norm(c), " "), LANG_MARKERS["en"])
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    return df.select(
        F.col("doc_id"),
        *[F.col(k) for k in keep],
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        wordpiece_count(c).alias("n_pieces"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        F.floor(F.lit(1000) * n_punct / safe_chars)
        .cast("long")
        .alias("punct_per_1000_chars"),
        F.floor(F.lit(1000) * n_stop / safe_tokens)
        .cast("long")
        .alias("stop_per_1000_tokens"),
        F.floor(n_chars / safe_tokens).cast("long").alias("mean_token_len_floor"),
    )


def language_expr(text_col: Column) -> tuple[Column, Column]:
    """(predicted_lang, marker_hits) expressions — row-local argmax of
    marker-word scores, tie-broken on ascending language code. Exposed
    as expressions so pipelines can fuse language-ID into an existing
    projection instead of paying a second scan + join."""
    toks = F.split(_norm(text_col), " ")
    # Linear-size argmax: one (-score, lang) struct per language,
    # sort_array ascending -> [0] is (max score, lowest lang code on
    # ties). The when-chain formulation re-embedded every language's
    # aggregate-HOF score inside every branch (~7x the subtrees), which
    # blew up whole-stage codegen: 7s compile + 2s run at sf0.1 vs
    # 3s + 1s for this shape, byte-identical output.
    entries = [
        F.struct(
            (-marker_count(toks, LANG_MARKERS[lang])).alias("neg"),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(LANG_MARKERS)
    ]
    top = F.sort_array(F.array(*entries))[0]
    best = (-top["neg"]).cast("long")
    pred = F.when(best > 0, top["lang"]).otherwise(F.lit("unknown"))
    return pred, best


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic -> (doc_id, predicted_lang, score).

    Scores each language by marker-word hits per document; argmax with
    deterministic tie-break on language code order. Row-local; at scale
    this is a pure map over the scan.
    """
    pred, best = language_expr(F.col(text_col))
    return df.select(
        F.col("doc_id"),
        pred.alias("predicted_lang"),
        best.alias("marker_hits"),
    )


# Fixed integer weights for the linear quality scorer. Integer-only
# arithmetic keeps the score bit-exact across engines (a sigmoid/exp
# calibration would inherit libm differences); the weights are the
# usual hand-tuned stand-ins for a trained fastText-style classifier's
# coefficients — swap in learned ones without touching the plan.
QUALITY_WEIGHTS = {
    "stop_per_1000_tokens": 5,
    "punct_per_1000_chars": -2,
}
_IDEAL_TOKEN_LEN = 5
_LEN_PENALTY = 50
_TOKEN_CREDIT_CAP = 256


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    keep: tuple[str, ...] = (),
    keep_features: tuple[str, ...] = (),
) -> DataFrame:
    """Model-based quality scoring: a linear classifier over the
    quality_features signals -> (doc_id, quality_score, quality_label).

    score = 5*stopword-rate - 2*punct-rate - 50*|mean_token_len - 5|
            + min(n_tokens, 256); labels cut at >= 2000 (high) and
    >= 800 (medium). Row-local integer projection fused onto the
    feature pass — at 100 TB this is the cheap scorer that gates which
    documents ever reach an expensive model scorer.

    ``keep`` passes input columns through (see quality_features);
    ``keep_features`` additionally retains named feature columns
    (e.g. ``n_tokens``) in the output, so a caller needing score +
    volume stats pays ONE text pass and no self-join.
    """
    f = quality_features(df, text_col, keep=keep)
    score = (
        F.lit(QUALITY_WEIGHTS["stop_per_1000_tokens"])
        * F.col("stop_per_1000_tokens")
        + F.lit(QUALITY_WEIGHTS["punct_per_1000_chars"])
        * F.col("punct_per_1000_chars")
        - F.lit(_LEN_PENALTY)
        * F.abs(F.col("mean_token_len_floor") - F.lit(_IDEAL_TOKEN_LEN))
        + F.least(F.col("n_tokens"), F.lit(_TOKEN_CREDIT_CAP))
    ).cast("long")
    return f.select(
        "doc_id",
        *keep,
        *keep_features,
        score.alias("quality_score"),
        F.when(score >= 2000, F.lit("high"))
        .when(score >= 800, F.lit("medium"))
        .otherwise(F.lit("low"))
        .alias("quality_label"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercased, whitespace-collapsed) — the exact-dedup key."""
    return df.select(
        F.col("doc_id"),
        F.md5(_norm(F.col(text_col))).alias("fingerprint"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Gopher-style repetition signals -> (doc_id, n_grams,
    n_distinct_grams, dup_gram_per_1000, top_token_per_1000).

    dup_gram_per_1000: fraction of n-gram occurrences that are repeats
    (templated/spammy text scores high). top_token_per_1000: share of
    the most frequent token (degenerate repetition). Both row-local
    array algebra over one token split — zipped shifted slices, lambdas
    touch only their variables (HOF discipline), zero shuffle.
    """
    staged = df.select(
        F.col("doc_id"), F.split(_norm(F.col(text_col)), " ").alias("__toks")
    )
    toks = F.col("__toks")
    m = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, m).alias(f"t{i}") for i in range(n)]
    )
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)])
    )
    with_arrays = staged.select(
        "doc_id",
        toks.alias("__t"),
        grams.alias("__g"),
    )
    n_grams = F.size(F.col("__g")).cast("long")
    n_distinct = F.size(F.array_distinct(F.col("__g"))).cast("long")
    # most-frequent-token share: count each distinct token's occurrences
    # with a filter pass (distinct x tokens work per row — bounded by
    # doc length, still row-local)
    tok_counts = F.transform(
        F.array_distinct(F.col("__t")),
        lambda t: F.size(F.filter(F.col("__t"), lambda x: x == t)),
    )
    top_tok = F.coalesce(F.array_max(tok_counts), F.lit(0)).cast("long")
    n_toks = F.size(F.col("__t")).cast("long")
    return with_arrays.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct_grams"),
        F.floor(
            F.lit(1000) * (n_grams - n_distinct) / F.greatest(n_grams, F.lit(1))
        )
        .cast("long")
        .alias("dup_gram_per_1000"),
        F.floor(F.lit(1000) * top_tok / F.greatest(n_toks, F.lit(1)))
        .cast("long")
        .alias("top_token_per_1000"),
    )


# PII patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
}


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails/URLs/phone-ish spans -> (doc_id, redacted,
    n_email, n_url, n_phone).

    Row-local regexp_replace chain (JVM, codegen) with per-kind match
    counts for audit; patterns are deliberately dialect-portable so the
    SQL oracle reproduces the exact redaction. Order matters: emails,
    then URLs, then phones — and each count is taken on the
    *progressively redacted* string, so a span swallowed by an earlier
    replacement (a phone-like digit run inside a URL) is never counted:
    sum of counts == number of placeholders in ``redacted``.
    At 100 TB this is a pure map over the scan — the shape every
    pre-training scrub pass needs.
    """
    c = F.col(text_col)
    n_email = F.coalesce(
        F.regexp_count(c, F.lit(PII_PATTERNS["email"])), F.lit(0)
    ).cast("long")
    after_email = F.regexp_replace(c, PII_PATTERNS["email"], "<EMAIL>")
    n_url = F.coalesce(
        F.regexp_count(after_email, F.lit(PII_PATTERNS["url"])), F.lit(0)
    ).cast("long")
    after_url = F.regexp_replace(after_email, PII_PATTERNS["url"], "<URL>")
    n_phone = F.coalesce(
        F.regexp_count(after_url, F.lit(PII_PATTERNS["phone"])), F.lit(0)
    ).cast("long")
    redacted = F.regexp_replace(after_url, PII_PATTERNS["phone"], "<PHONE>")
    return df.select(
        F.col("doc_id"),
        redacted.alias("redacted"),
        n_email.alias("n_email"),
        n_url.alias("n_url"),
        n_phone.alias("n_phone"),
    )


def winnow_gram_hashes(
    df: DataFrame,
    text_col: str = "text",
    k: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc_id, __hs array<long>) — the ordered gram-hash sequence the
    winnowing window slides over; split out of winnow_fingerprints so
    the fast-path gate (queries.winnow_fast_gate) can check fp-subset
    membership against the SAME gram plan, not a reimplementation.

    HOF discipline (100 TB rule): a lambda may touch ONLY its lambda
    variable — any outer expression inside a lambda is re-evaluated
    per element, turning O(n) plans into O(n²). Expensive arrays are
    therefore staged as materialized columns between selects (each
    referenced >1 time, so CollapseProject won't inline them) and
    sliding windows are built by zipping shifted slices, never by
    slice-inside-transform.
    """
    staged = df.select(
        F.col("doc_id"),
        F.col(text_col).alias("__text"),
        F.split(_norm(F.col(text_col)), " ").alias("__toks"),
    )
    toks = F.col("__toks")
    m = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, m).alias(f"t{i}") for i in range(k)]
    )
    grams_expr = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(k)])
    )
    grams = F.when(F.size(toks) >= k, grams_expr).otherwise(
        F.array(_norm(F.col("__text")))
    )
    # md5 (default) is SQL-oracle-reproducible; the gram hash dominates
    # long-document cost (~1 digest per token), so hash_fn="xxhash64"
    # offers the JVM-native fast path when cross-engine parity isn't
    # needed — same fingerprinting semantics, different hash values
    if hash_fn == "xxhash64":
        def gram_hash(g):
            return F.xxhash64(g)
    elif hash_fn == "md5":
        def gram_hash(g):
            return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64': {hash_fn}")
    return staged.select(
        "doc_id",
        F.transform(grams, gram_hash).alias("__hs"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    hash every word k-gram, slide a w-window over the ordered hash
    sequence, keep each window's minimum, emit the distinct mins as
    (doc_id, fp) rows.

    The fingerprint set is position-robust (local edits perturb only
    nearby windows) and size-bounded (~1/w of the grams), which is what
    makes it the plagiarism/near-dup index of choice at corpus scale.
    Everything is row-local array algebra — no shuffle, no UDF; the
    gram hash is the first 15 hex digits of md5 parsed as int64 so a
    SQL oracle reproduces it bit-for-bit. Docs shorter than k tokens
    fall back to one fingerprint of the whole normalized text.
    """
    hashed = winnow_gram_hashes(df, text_col, k, hash_fn)
    hs = F.col("__hs")
    n_wins = F.greatest(F.size(hs) - F.lit(w - 1), F.lit(0))
    zipped_h = F.arrays_zip(
        *[F.slice(hs, i + 1, n_wins).alias(f"h{i}") for i in range(w)]
    )
    full_wins = F.transform(
        zipped_h, lambda s: F.least(*[s[f"h{i}"] for i in range(w)])
    )
    wins = F.when(F.size(hs) >= w, full_wins).otherwise(
        F.array(F.array_min(hs))
    )
    return hashed.select(
        F.col("doc_id"), F.explode(F.array_distinct(wins)).alias("fp")
    )


def shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Word n-gram shingles, one row per (doc_id, shingle), distinct.

    Built from split + sliding-window ``transform`` over token arrays —
    JVM-side, no UDF. The explode is the standard scale path: shingle
    rows shuffle by shingle for the inverted-index join used by both
    n-gram Jaccard and MinHash.
    """
    # Shifted-slice zip, not slice-inside-transform: the token array is
    # a materialized column and every lambda touches only its variable
    # (see winnow_fingerprints for why — O(n) vs O(n²) per doc).
    staged = df.select(
        F.col("doc_id"), F.split(_norm(F.col(text_col)), " ").alias("__toks")
    )
    toks = F.col("__toks")
    m = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, m).alias(f"t{i}") for i in range(n)]
    )
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)])
    )
    return (
        staged.select(F.col("doc_id"), F.explode(grams).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
    )


def span_windows(
    df: DataFrame, text_col: str = "text", n: int = 12
) -> DataFrame:
    """(doc_id, pos, span_hash): md5 of every sliding n-token window of
    the normalized text, 0-based pos. Docs shorter than n tokens emit
    nothing (they cannot contain an n-token span by definition — unlike
    winnow_fingerprints' whole-doc fallback, whose job is indexing every
    doc; this op's job is finding *spans*, so short docs are out of
    domain).

    The shared scan stage of the exact duplicate-span family (Lee et
    al., "Deduplicating Training Data Makes Language Models Better",
    ACL 2022): their suffix-array substring dedup finds duplicated
    spans of ANY length >= L but needs a global suffix sort that does
    not distribute; fixed-length rolling windows are the standard
    distributed approximation — a duplicated region of length m >= n
    shows up as m-n+1 duplicated windows, so nothing longer than n is
    missed, and coverage (below) reassembles the full region extent
    from overlapping hits. Same row-local shifted-slice-zip as
    winnow_fingerprints: no UDF, no shuffle, ~1 digest per token.
    """
    return _span_windows_keyed(df, "doc_id", text_col, n)


def _span_windows_keyed(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """span_windows over an arbitrary key column — the collapsed paths
    window over one row per DISTINCT text keyed by its fingerprint
    instead of per document."""
    staged = df.select(
        F.col(id_col), F.split(_norm(F.col(text_col)), " ").alias("__toks")
    ).where(F.size("__toks") >= n)
    toks = F.col("__toks")
    m = F.size(toks) - F.lit(n - 1)
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, m).alias(f"t{i}") for i in range(n)]
    )
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)])
    )
    return staged.select(
        id_col, F.posexplode(grams).alias("pos", "__g")
    ).select(id_col, "pos", F.md5(F.col("__g")).alias("span_hash"))


def _span_fp(text_col: str) -> Column:
    """Text-group fingerprint for the collapsed span paths: md5 of the
    NORMALIZED text — two documents with equal norms have identical
    token arrays, hence identical windows, coverage and strip output.
    128-bit md5 keeps the grouping collision-safe at corpus scale
    (the dedup family's exact-group precedent)."""
    return F.md5(_norm(F.col(text_col)))


def _span_text_groups(
    df: DataFrame, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(stats, members): the collapse structure of the span family.
    stats = one row per distinct normalized text: (__fp, __t one member
    text, __m member count, __min_doc) — vocabulary-of-texts-sized.
    members = (doc_id, __fp), one row per document.

    stats is persist()ed: every collapsed consumer reads it 2-4 times
    (window source, weight join, length/rebuild base), and without the
    persist each read re-runs the corpus-scale fingerprint groupBy —
    measured at the 5M-doc verbatim tier: coverage 32.1s -> 11.8s,
    strip 23.6s -> 11.1s. The frame is distinct-TEXT-sized (the whole
    point of the collapse), so the cache footprint is the collapsed
    corpus, never the expanded one. House caller-owns-unpersist
    contract (see rarity_top_terms' dfreq): one-shot pipelines let the
    session LRU reclaim it; long-lived sessions calling the span
    operators repeatedly release every accumulated stats frame with
    ``unpersist_span_stats()`` after their terminal action (each call
    here also registers its handle there)."""
    stats = df.groupBy(_span_fp(text_col).alias("__fp")).agg(
        F.min_by(F.col(text_col), F.col("doc_id")).alias("__t"),
        F.count("*").alias("__m"),
        F.min("doc_id").alias("__min_doc"),
    ).persist()
    _SPAN_STATS_HANDLES.append(stats)
    members = df.select(
        F.col("doc_id"), _span_fp(text_col).alias("__fp")
    )
    return stats, members


_SPAN_STATS_HANDLES: list[DataFrame] = []


def unpersist_span_stats() -> int:
    """Release every stats frame the span family has persisted in this
    process (round-6 advisory: repeated collapsed dup_span_* calls in a
    long-lived session would otherwise accumulate cached distinct-text
    frames until clearCache/LRU eviction). Call after the terminal
    action of a span pipeline; returns the number released. Safe to
    call at any time — an in-flight job holding one of these frames
    just recomputes from source."""
    n = 0
    while _SPAN_STATS_HANDLES:
        h = _SPAN_STATS_HANDLES.pop()
        try:
            h.unpersist()
            n += 1
        except Exception:
            pass
    return n


def _probe_span_collapse(df: DataFrame, text_col: str) -> bool:
    """One-aggregate dup-ratio probe (the operators/dedup philosophy,
    shared break-even constant): collapse only when a meaningful
    fraction of documents are exact-normalized duplicates."""
    from clickhouse_only_importer_prototype_spark.operators.dedup import (
        _COLLAPSE_MIN_DUP_FRAC,
    )

    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(
            F.xxhash64(_norm(F.col(text_col))), rsd=0.02
        ).alias("d"),
    ).first()
    n, d = (r["n"] or 0), (r["d"] or 0)
    return n > 0 and (n - d) >= _COLLAPSE_MIN_DUP_FRAC * n


def dup_spans(
    df: DataFrame,
    text_col: str = "text",
    n: int = 12,
    min_docs: int = 2,
    collapse: bool | None = None,
) -> DataFrame:
    """Exact duplicated n-token spans appearing in >= min_docs DISTINCT
    documents: (span_hash, n_occurrences, n_docs, first_doc).

    Cross-doc duplication only, by contract: a span repeated within one
    document is repetition_features' business (boilerplate inside a
    page), while a span shared across documents is corpus-level
    contamination — the thing substring dedup removes. n_occurrences
    still counts every occurrence (including within-doc repeats of a
    cross-doc span), since that is the row weight a removal pass needs.

    Scale shape: two-stage aggregate — groupBy(span_hash, doc_id) first
    (the shuffle carries one row per distinct (span, doc), and the
    partial agg combines within-doc repeats map-side), then the
    span-level rollup groups rows already partitioned by span_hash
    prefix. Never a COUNT(DISTINCT) over raw token-volume rows.

    Duplicate-heavy corpora (``collapse``, default None = probe the
    dup ratio, the operators/dedup gating philosophy): identical
    normalized texts contribute identical window sets, so the windows
    run over one representative per DISTINCT text and the aggregates
    reweight by group size — n_occurrences = sum(m_g * c_g),
    n_docs = sum over groups containing the span of m_g, first_doc =
    min over those groups of the group's min doc_id. A corpus of
    verbatim copies does ~1/copies of the hash/shuffle work; output is
    IDENTICAL either way (measured at the 100x verbatim tier:
    24.97s -> see survey round-6 table).
    """
    if collapse is None:
        collapse = _probe_span_collapse(df, text_col)
    if not collapse:
        w = span_windows(df, text_col, n)
        per_doc = w.groupBy("span_hash", "doc_id").agg(
            F.count("*").alias("__c")
        )
        return (
            per_doc.groupBy("span_hash")
            .agg(
                F.sum("__c").alias("n_occurrences"),
                F.count("*").alias("n_docs"),
                F.min("doc_id").alias("first_doc"),
            )
            .where(F.col("n_docs") >= min_docs)
        )
    stats, _ = _span_text_groups(df, text_col)
    w = _span_windows_keyed(stats, "__fp", "__t", n)
    per_text = w.groupBy("span_hash", "__fp").agg(
        F.count("*").alias("__c")
    )
    return (
        per_text.join(stats.select("__fp", "__m", "__min_doc"), "__fp")
        .groupBy("span_hash")
        .agg(
            F.sum(F.col("__c") * F.col("__m")).alias("n_occurrences"),
            F.sum("__m").alias("n_docs"),
            F.min("__min_doc").alias("first_doc"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def _dup_hit_positions(
    wins: DataFrame, id_col: str, weight: Column, min_docs: int
) -> DataFrame:
    """(id_col, pos) window positions whose span is duplicated across
    >= min_docs documents. The distinct-doc count per span is a
    lag-flag running sum — one sort per span partition, O(1) state per
    row — NOT collect_set().over(span): a set materialized per ROW is
    O(group²) memory traffic exactly on the dup-heavy inputs this
    filter exists for. ``weight`` is what one distinct id_col value
    counts for: 1 on the per-document path, the text-group member
    count on the collapsed path."""
    by_span_sorted = Window.partitionBy("span_hash").orderBy(id_col, "pos")
    prev = F.lag(id_col).over(by_span_sorted)
    flagged = wins.withColumn(
        "__w1",
        F.when(prev.isNull() | (prev != F.col(id_col)), weight).otherwise(
            F.lit(0)
        ),
    )
    by_span = Window.partitionBy("span_hash")
    return (
        flagged.withColumn("__nd", F.sum("__w1").over(by_span))
        .where(F.col("__nd") >= min_docs)
        .select(id_col, "pos")
    )


def _merge_islands(hits: DataFrame, id_col: str, n: int) -> DataFrame:
    """(id_col, __island, __s, __e): maximal merged token-position
    intervals from duplicated-window start positions — the shared core
    of coverage (reports interval lengths) and strip (deletes the
    intervals). Islands are disjoint and non-adjacent by construction:
    a window start within one token of the running max end extends the
    current island, so two islands are always separated by at least
    one kept token."""
    by_key = Window.partitionBy(id_col).orderBy("pos")
    run_max_end = F.max(F.col("pos") + F.lit(n - 1)).over(
        by_key.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        hits.select(
            id_col,
            "pos",
            (F.col("pos") > F.coalesce(run_max_end, F.lit(-1)) + 1)
            .cast("long")
            .alias("__new"),
        )
        .withColumn("__island", F.sum("__new").over(by_key))
        .groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("__s"),
            (F.max("pos") + F.lit(n - 1)).cast("int").alias("__e"),
        )
    )


def _dup_islands(
    df: DataFrame, text_col: str, n: int, min_docs: int
) -> DataFrame:
    """Per-document islands (uncollapsed path): windows over every doc,
    weight 1 per distinct doc."""
    w = span_windows(df, text_col, n)
    hits = _dup_hit_positions(w, "doc_id", F.lit(1), min_docs)
    return _merge_islands(hits, "doc_id", n)


def _dup_islands_collapsed(
    stats: DataFrame, n: int, min_docs: int
) -> DataFrame:
    """Per-distinct-TEXT islands (collapsed path): windows over one
    representative per normalized text, each distinct text counting
    its member multiplicity toward the cross-doc gate. Identical
    texts are distinct documents, so a text group with m >= min_docs
    members makes every one of its windows duplicated."""
    w = _span_windows_keyed(stats, "__fp", "__t", n).join(
        stats.select("__fp", "__m"), "__fp"
    )
    hits = _dup_hit_positions(w, "__fp", F.col("__m"), min_docs)
    return _merge_islands(hits, "__fp", n)


def dup_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    n: int = 12,
    min_docs: int = 2,
    collapse: bool | None = None,
) -> DataFrame:
    """Per-document duplicated-text budget: what fraction of each doc's
    tokens sits inside an n-token span that also appears in >= min_docs
    distinct docs. (doc_id, n_tokens, covered_tokens, coverage_1e6) —
    one row per document, coverage_1e6 = covered*1e6 div n_tokens.

    This is THE metric a substring-dedup pass reports before deleting
    anything (Lee et al. 2022 report it as "fraction of tokens removed")
    and the per-source version is how you find the boilerplate-heavy
    crawl slice. Overlapping/adjacent duplicated windows must not
    double-count, so hits per doc are merged gaps-and-islands style:
    window start positions sorted per doc, a new island opens when a
    start position clears the running max end by more than one token,
    and each island contributes max(end)-min(start)+1 tokens.

    Scale shape: one token-volume scan (span_windows), then two
    shuffles of the hit frame — (1) by span_hash, where a lag-flag
    running sum counts distinct docs per span in O(1) state per row
    (see _dup_hit_positions) WITHOUT a groupBy+semi-join second pass
    over the full window frame; (2) by doc for the island merge, after
    which the island rollup and the per-doc sum reuse the same
    partitioning (no further exchange).

    ``collapse`` (None = dup-ratio probe): coverage is a pure function
    of the normalized text and the global dup-span set, so on
    dup-heavy corpora everything runs per DISTINCT text (member counts
    weighting the cross-doc gate) and per-doc rows come from one
    member->fingerprint join at the end. Identical output, ~1/copies
    of the token work on verbatim-copy corpora.
    """
    if collapse is None:
        collapse = _probe_span_collapse(df, text_col)
    covered_of = (
        F.coalesce(F.col("covered_tokens"), F.lit(0).cast("long"))
    )
    out_cols = [
        "doc_id",
        "n_tokens",
        covered_of.alias("covered_tokens"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr("div(coalesce(covered_tokens, 0) * 1000000, n_tokens)")
        )
        .alias("coverage_1e6"),
    ]
    if not collapse:
        per_doc = (
            _dup_islands(df, text_col, n, min_docs)
            .groupBy("doc_id")
            .agg(
                F.sum(F.col("__e") - F.col("__s") + 1)
                .cast("long")
                .alias("covered_tokens")
            )
        )
        lens = df.select(
            F.col("doc_id"), token_count(F.col(text_col)).alias("n_tokens")
        )
        return lens.join(per_doc, "doc_id", "left").select(*out_cols)
    stats, members = _span_text_groups(df, text_col)
    per_text = (
        _dup_islands_collapsed(stats, n, min_docs)
        .groupBy("__fp")
        .agg(
            F.sum(F.col("__e") - F.col("__s") + 1)
            .cast("long")
            .alias("covered_tokens")
        )
    )
    per_fp = stats.select(
        "__fp", token_count(F.col("__t")).alias("n_tokens")
    ).join(per_text, "__fp", "left")
    return members.join(per_fp, "__fp").select(*out_cols)


def dup_span_strip(
    df: DataFrame,
    text_col: str = "text",
    n: int = 12,
    min_docs: int = 2,
    collapse: bool | None = None,
) -> DataFrame:
    """The removal transform that coverage only reports: delete every
    token sitting inside a cross-doc duplicated n-token span and
    rebuild the text. (doc_id, n_tokens, removed_tokens, clean_text) —
    one row per document; untouched docs pass through with
    removed_tokens = 0, fully-duplicated docs come back with
    clean_text = ''.

    Removal hits EVERY occurrence, canonical copies included — the
    published exact-substring-dedup semantics (Lee et al. 2022 cut all
    occurrences of a duplicated range and note that keeping one copy
    is an optional variant). Keeping a canonical copy is ill-posed at
    the island level anyway: an island is the union of many
    overlapping spans whose "first" documents differ.

    Scale shape: the island frame (one row per merged interval —
    sparse, duplication-bounded) is collect_list'ed per doc and joined
    LEFT back to the token arrays, so the rebuild is row-local: a
    positional filter keeps tokens outside every island. The filter
    lambda probes the island list per token — O(tokens x islands) per
    doc, with islands disjoint-and-separated so their count is bounded
    by min(duplicated regions, tokens/2); the probe list is tiny
    compared to re-exploding the corpus into (doc, pos, token) rows
    and anti-joining, which would shuffle token-volume rows a third
    time.

    ``collapse`` (None = dup-ratio probe): clean_text is a pure
    function of the normalized text and the global dup-span set, so on
    dup-heavy corpora the rebuild runs once per DISTINCT text and
    per-doc rows come from the member->fingerprint join. Identical
    output, ~1/copies of the token work on verbatim-copy corpora.
    """
    if collapse is None:
        collapse = _probe_span_collapse(df, text_col)
    if not collapse:
        islands = _dup_islands(df, text_col, n, min_docs)
        base = df.select(
            F.col("doc_id"),
            F.split(_norm(F.col(text_col)), " ").alias("__toks"),
        )
        return _strip_rebuild(base, islands, "doc_id").select(
            "doc_id", "n_tokens", "removed_tokens", "clean_text"
        )
    stats, members = _span_text_groups(df, text_col)
    islands = _dup_islands_collapsed(stats, n, min_docs)
    base = stats.select(
        F.col("__fp"), F.split(_norm(F.col("__t")), " ").alias("__toks")
    )
    per_fp = _strip_rebuild(base, islands, "__fp")
    return members.join(per_fp, "__fp").select(
        "doc_id", "n_tokens", "removed_tokens", "clean_text"
    )


def _strip_rebuild(
    base: DataFrame, islands: DataFrame, id_col: str
) -> DataFrame:
    """Row-local strip core: LEFT-join collect_list'ed island intervals
    to staged token arrays keyed by ``id_col`` and rebuild the text by
    positional filter. Returns (id_col, n_tokens, removed_tokens,
    clean_text)."""
    ivs = islands.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("__s", "__e"))).alias("__iv")
    )
    staged = base.join(ivs, id_col, "left")
    toks = F.col("__toks")
    kept = F.when(F.col("__iv").isNull(), toks).otherwise(
        F.filter(
            toks,
            lambda t, i: ~F.exists(
                F.col("__iv"),
                lambda iv: (i >= iv["__s"]) & (i <= iv["__e"]),
            ),
        )
    )
    staged = staged.select(
        id_col, toks.alias("__toks"), kept.alias("__kept")
    )
    n_tokens = F.when(
        (F.size("__toks") == 1) & (F.element_at("__toks", 1) == ""),
        F.lit(0),
    ).otherwise(F.size("__toks"))
    return staged.select(
        id_col,
        n_tokens.cast("long").alias("n_tokens"),
        (F.size("__toks") - F.size("__kept")).cast("long").alias(
            "removed_tokens"
        ),
        F.concat_ws(" ", F.col("__kept")).alias("clean_text"),
    )


# Above this many distinct terms the broadcast dictionary path is off
# the table: 4M (term, doc_freq) map entries is ~100-200 MB serialized
# — at the edge of what a 1-row broadcast should carry per executor.
_RARITY_BROADCAST_VOCAB_MAX = 4_000_000


def _sorted_tokens(text_col: str) -> Column:
    """Sorted non-empty token array of a document — the staging input
    of _entries_from_sorted. Callers stage it through a select (the
    array is referenced more than once, so CollapseProject must not
    inline the split+sort subtree into every reference)."""
    toks = F.filter(
        F.split(_norm(F.col(text_col)), " "), lambda t: t != F.lit("")
    )
    return F.array_sort(toks)


def _entries_from_sorted(st: Column, n: Column) -> Column:
    """(term, tf) structs from a pre-sorted, pre-staged token array:
    run starts are the positions where the array changes value."""
    m = F.greatest(n - 1, F.lit(0))
    neq = F.zip_with(F.slice(st, 2, m), F.slice(st, 1, m), lambda c, p: c != p)
    starts = F.concat(
        F.array(F.lit(0)),
        F.filter(
            F.transform(neq, lambda x, i: F.when(x, i + 1)),
            lambda v: v.isNotNull(),
        ),
    )
    ends = F.concat(F.slice(starts, 2, F.size(starts) - 1), F.array(n))
    run = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(
            F.element_at(st, s.cast("int") + 1).alias("term"),
            (e - s).cast("long").alias("tf"),
        ),
    )
    empty = F.array().cast("array<struct<term:string,tf:bigint>>")
    return F.when(n == 0, empty).otherwise(run)


def rarity_top_terms(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    broadcast_vocab_max: int = _RARITY_BROADCAST_VOCAB_MAX,
) -> DataFrame:
    """Per-document top-k distinguishing terms by a TF-IDF-shaped
    rarity score: (doc_id, term, tf, doc_freq, score_1e6, rank).

    score_1e6 = (tf * 1_000_000) div doc_freq — term frequency weighted
    by inverse document frequency. Deliberately LOG-FREE: the classic
    tf·ln(N/df) shares the same ranking monotonicity per (tf, df), but
    ln() is not guaranteed correctly-rounded in either engine, and a
    1-ulp difference at a floor() boundary would break cross-engine
    hash equality. Pure int64 arithmetic is exactly reproducible
    everywhere (and at 100 TB, determinism under recompute/retry is a
    correctness property). Rank ties break lexicographically by term.

    Scale shape (round-6 rewrite, round-5 verdict #4): the (doc, term)
    frame is the enemy — at the 5M-doc tier it is 116M rows, and BOTH
    prior shapes paid corpus-scale shuffles over it twice (the window
    sort alone measured ~270s; persisting it was measured-rejected in
    r5 at 174.5s vs 143.5s recompute, and a hash-keyed persist+rank()
    prefilter variant measured 228.5s — rank() degenerates when scores
    tie heavily). This shape never materializes it:

      * per-doc term counts are ROW-LOCAL (_doc_term_entries:
        array_sort + run-length over the token array — no explode, no
        shuffle, pure codegen);
      * doc_freq explodes only the per-doc DISTINCT term list into a
        map-side-combinable count whose shuffle carries <= |vocab|
        rows per mapper; the dfreq frame is persisted (vocab-sized)
        and counted — that count picks the path;
      * |vocab| <= _RARITY_BROADCAST_VOCAB_MAX (every measured tier;
        most real corpora after normalization): dfreq folds into ONE
        map row, broadcast; scoring + (score DESC, term) top-k run
        INSIDE each document row (transform + array_sort on structs
        whose leading field is the negated score) and posexplode emits
        exactly k rows/doc — the only shuffle in the whole query is
        the vocab-sized dfreq aggregate;
      * |vocab| beyond the gate (open-domain web tokens): fall back to
        the exploded plan — tf groupBy (doc, term), join the persisted
        dfreq (int-pair keys are pointless there: the join and window
        dominate), per-doc row_number window. The honest distributed
        shape when the dictionary genuinely doesn't fit.

    The dfreq persist follows the house caller-owns-unpersist contract
    (see pack_sequences); it is vocab-bounded, never corpus-sized.
    """
    staged = df.select(
        F.col("doc_id"), _sorted_tokens(text_col).alias("__st")
    )
    staged = staged.select(
        "doc_id",
        _entries_from_sorted(F.col("__st"), F.size("__st")).alias("entries"),
    )
    # doc_freq needs each doc's DISTINCT terms only — array_distinct +
    # explode is ~4x cheaper than the run-length entries chain
    # (measured 13.3s vs 50.7s at the 5M-doc tier), so the expensive
    # entries expression is evaluated exactly once, in the scoring pass
    toks = F.filter(
        F.split(_norm(F.col(text_col)), " "), lambda t: t != F.lit("")
    )
    dfreq = (
        df.select(F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("doc_freq"))
        .persist()
    )
    n_vocab = dfreq.count()
    if n_vocab <= broadcast_vocab_max:
        dmap = dfreq.agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "doc_freq"))
            ).alias("__dmap")
        )

        def _score(e):
            # exact int64 floor-div without an expr-only div(): t and
            # d are positive, t - t%d is exactly divisible, and the
            # double division of two exact ints whose quotient is an
            # exact int is correctly rounded to that int (plain
            # t/d + floor could round a just-below-boundary quotient
            # UP and break oracle equality)
            t = e["tf"] * F.lit(1000000)
            d = F.element_at(F.col("__dmap"), e["term"])
            return ((t - t % d) / d).cast("long")

        scored = F.transform(
            F.col("entries"),
            lambda e: F.struct(
                (-_score(e)).alias("neg"),
                e["term"].alias("term"),
                e["tf"].alias("tf"),
                F.element_at(F.col("__dmap"), e["term"]).alias("doc_freq"),
            ),
        )
        top = F.slice(F.array_sort(scored), 1, k)
        return (
            staged.crossJoin(F.broadcast(dmap))
            .select("doc_id", F.posexplode(top).alias("pos", "s"))
            .select(
                "doc_id",
                F.col("s.term").alias("term"),
                F.col("s.tf").alias("tf"),
                F.col("s.doc_freq").alias("doc_freq"),
                (-F.col("s.neg")).cast("long").alias("score_1e6"),
                (F.col("pos") + 1).cast("long").alias("rank"),
            )
        )
    # vocabulary too large for a broadcast map: exploded fallback
    tf = staged.select(
        "doc_id", F.explode("entries").alias("e")
    ).select("doc_id", F.col("e.term").alias("term"), F.col("e.tf").alias("tf"))
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        "tf",
        "doc_freq",
        F.expr("div(tf * 1000000, doc_freq)").alias("score_1e6"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_1e6").desc(), F.col("term")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= k)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG / context-window
    prep step: every document becomes ceil(max(n,1)/stride) chunks of
    up to ``chunk_size`` whitespace tokens starting every ``stride``
    tokens (consecutive chunks overlap by chunk_size - stride).

    Output: (id, chunk_idx, start, n_tokens, chunk_text). A document
    always yields at least one chunk (possibly a single empty-string
    token — whitespace-split of "" is [""], same both engines).

    Scale: pure row-local JVM codegen (split / sequence / posexplode /
    slice) — zero shuffles, zero Python; output size is input tokens
    x (chunk_size/stride) duplication, the explicit overlap cost.
    """
    if chunk_size < 1 or stride < 1:
        raise ValueError("chunk_size and stride must be >= 1")
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - 1, F.lit(0)),
        F.lit(stride),
    )
    return (
        df.select(
            F.col(id_col), toks.alias("__toks"), F.posexplode(starts).alias("chunk_idx", "start")
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("start"),
            F.least(
                F.lit(chunk_size).cast("long"),
                (F.size("__toks") - F.col("start")).cast("long"),
            ).alias("n_tokens"),
            F.concat_ws(
                " ", F.slice("__toks", F.col("start") + 1, F.lit(chunk_size))
            ).alias("chunk_text"),
        )
    )


def bpe_exclude_delimiter_words(
    words: DataFrame, word_col: str = "word"
) -> DataFrame:
    """Drop words containing the state/pair delimiters '/' or '|' —
    the rendering below is only unambiguous without them. Enforced (not
    assumed): real corpora contain URLs/paths/pipes even after
    normalization; excluded words simply don't vote on merges, the
    same treatment real BPE trainers give their reserved bytes."""
    return words.where(~F.col(word_col).rlike("[/|]"))


def bpe_word_states(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Render each distinct word as a '/'-delimited symbol state
    ('the' -> '/t/h/e/') — the working representation for BPE merge
    training. Callers pass words through bpe_exclude_delimiter_words
    first (bpe_train/bpe_encode do) so symbols never contain '/' or
    '|' and the delimiters are unambiguous.

    Scale: BPE trainers operate on the DISTINCT-word frequency table,
    never the corpus — Zipf bounds it at vocab scale (~10^5..10^6 rows
    regardless of corpus size), so every downstream iteration is a
    small row-local job.
    """
    return words.select(
        F.col(word_col).alias("word"),
        F.concat(
            F.lit("/"),
            F.array_join(F.split(F.col(word_col), ""), "/"),
            F.lit("/"),
        ).alias("state"),
        "n",
    )


def bpe_pair_counts(states: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the current merge states,
    weighted by word frequency. Output: (pair 'a|b', pair_count).

    Scale: row-local explode over vocab-scale states + one map-side
    combinable groupBy; pair cardinality is bounded by total symbol
    transitions in the vocab, not the corpus."""
    syms = F.split(F.expr("substring(state, 2, length(state)-2)"), "/")
    pairs = (
        F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.concat(
                    F.element_at(syms, i), F.lit("|"), F.element_at(syms, i + 1)
                ),
            ),
        )
        .otherwise(F.expr("array()").cast("array<string>"))
    )
    return (
        states.select(F.explode(pairs).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").cast("long").alias("pair_count"))
    )


def bpe_best_pair(pair_counts: DataFrame) -> DataFrame:
    """The single next merge rule: argmax by (count desc, pair asc) —
    the deterministic tie-break every BPE trainer needs for
    reproducible vocabularies. TakeOrderedAndProject: no global sort
    materializes."""
    return (
        pair_counts.orderBy(F.col("pair_count").desc(), F.col("pair"))
        .limit(1)
        .select(
            F.split("pair", "[|]").getItem(0).alias("left_sym"),
            F.split("pair", "[|]").getItem(1).alias("right_sym"),
            "pair_count",
        )
    )


# Canonical greedy-leftmost BPE merge as a string fold: walk symbols
# left to right; when the last emitted symbol is exactly `a` and the
# next is `b`, fuse them. The '/'-anchored suffix test makes the match
# symbol-exact (never a substring collision), and because the fused
# symbol 'ab' no longer ends with '/a/' (unless a == ab, impossible),
# occurrences merge non-overlapping leftmost — e.g. 'a a a' -> 'aa a',
# exactly the reference BPE semantics. DuckDB twin: list_reduce with
# the identical lambda (both engines fold left with a string acc).
_BPE_MERGE_FOLD = (
    "aggregate(split(substring(state, 2, length(state)-2), '/'), '/', "
    "(acc, x) -> CASE WHEN right(acc, length(left_sym)+2) = '/'||left_sym||'/' "
    "AND x = right_sym "
    "THEN left(acc, length(acc)-length(left_sym)-1)||left_sym||right_sym||'/' "
    "ELSE acc||x||'/' END)"
)


def bpe_apply_merge(states: DataFrame, best: DataFrame) -> DataFrame:
    """Apply one merge rule to every word state. The rule is a 1-row
    frame (broadcast literal) — the fold itself is row-local JVM
    codegen; no Python, no shuffle."""
    return states.crossJoin(F.broadcast(best)).select(
        "word", F.expr(_BPE_MERGE_FOLD).alias("state"), "n"
    )


# Collected-vocab ceiling for driver-local BPE training. Industrial
# BPE trainers are word-count-first: the corpus collapses to the
# Zipf-bounded distinct-word table and training runs in one process
# on that table (HF tokenizers does exactly this). 2M (word, count)
# rows is tens of MB on the driver — same budget class as the
# dedup_clusters union-find and kmeans centroid collects. Above it,
# the distributed iteration below takes over (same semantics, proven
# equal in tests).
LOCAL_VOCAB_MAX = 2_000_000


def _bpe_train_local(wc: dict, n_merges: int):
    """Driver-local canonical BPE: returns (rules, final_states) where
    rules = [(step, a, b, count)] and final_states maps word -> symbol
    list. Semantics identical to the distributed fold: greedy-leftmost
    non-overlapping merges, argmax by (count desc, 'a|b' asc) — the
    pair tie-break compares the SAME 'a|b' rendering the distributed
    path orders on (ASCII symbols, so python and UTF8 order agree)."""
    states: dict = {w: tuple(w) for w in wc}
    rules = []
    for step in range(1, n_merges + 1):
        counts: dict = {}
        for w, syms in states.items():
            n = wc[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + "|" + kv[0][1])
        )
        rules.append((step, a, b, c))
        for w, syms in states.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            states[w] = tuple(out)
    return rules, states


def _bpe_iterate(words: DataFrame, n_merges: int):
    """Shared distributed training loop: returns (final_states,
    rules) where rules = [(step, left, right, count)] COLLECTED rows
    (one 1-row ``first()`` per iteration — driver-side metadata, the
    n_nodes-count class; nothing per-iteration stays persisted). The
    caller owns unpersisting final_states after its action runs;
    stops early if no pairs remain (all-single-symbol vocab)."""
    spark = words.sparkSession
    states = bpe_word_states(words).persist()
    rules = []
    for k in range(1, n_merges + 1):
        row = bpe_best_pair(bpe_pair_counts(states)).first()
        if row is None:
            break
        rules.append((k, row.left_sym, row.right_sym, row.pair_count))
        best_lit = arrow_local_df(
            spark,
            [(row.left_sym, row.right_sym, row.pair_count)],
            "left_sym string, right_sym string, pair_count long",
        )
        new_states = bpe_apply_merge(states, best_lit).persist()
        new_states.count()  # materialize before dropping the parent
        states.unpersist()
        states = new_states
    return states, rules


def bpe_train(words: DataFrame, n_merges: int) -> DataFrame:
    """BPE tokenizer merge training: ``n_merges`` iterations of
    (count adjacent pairs -> pick argmax rule -> fuse in every word),
    over the distinct-word frequency table. Returns the ordered merge
    table (step, left_sym, right_sym, pair_count) — the ``merges.txt``
    artifact a tokenizer trainer emits.

    Exactness: pure integer counts and deterministic (count desc,
    pair asc) tie-breaks — bit-identical cross-engine; the greedy
    fold above is canonical BPE.

    Scale: every iteration runs on the Zipf-bounded vocab frame
    (persisted once); pair counting is map-side combinable; the rule
    is a 1-row TakeOrdered broadcast. K merges = K tiny jobs — the
    industrial word-count-first BPE trainer shape, never touching the
    corpus after the initial word count.

    Adaptive execution (the dedup_clusters pattern): when the distinct
    vocab fits the driver budget (LOCAL_VOCAB_MAX), collect the word
    counts and train locally in one pass — the per-iteration Spark
    jobs are pure scheduling overhead at vocab scale (measured 18.7s
    -> ~2s at sf0.1, 31-word vocab). Past the budget the distributed
    iteration runs with identical semantics (equality pinned in
    tests)."""
    words = bpe_exclude_delimiter_words(words).persist()
    try:
        if words.count() <= LOCAL_VOCAB_MAX:
            wc = {r["word"]: r["n"] for r in words.collect()}
            rules, _ = _bpe_train_local(wc, n_merges)
        else:
            states, rules = _bpe_iterate(words, n_merges)
            states.unpersist()
        return arrow_local_df(
            words.sparkSession,
            [tuple(r) for r in rules],
            "step long, left_sym string, right_sym string, "
            "pair_count long",
        ).orderBy("step")
    finally:
        words.unpersist()


def bpe_encode(words: DataFrame, n_merges: int) -> DataFrame:
    """The APPLY side of BPE: train ``n_merges`` rules, return every
    word's final segmentation — (word, state, n, n_tokens) where
    n_tokens counts the '/'-separated symbols of the merged state
    (length(state) - length(replace(state,'/','')) - 1; symbols never
    contain '/'). The per-word token count is what fertility /
    compression metrics aggregate. Same scale shape and adaptive
    local/distributed split as bpe_train; the returned frame stays
    vocab-scale (distributed path: eagerly checkpointed so no cache
    or lineage is left pinned behind the returned frame)."""
    words = bpe_exclude_delimiter_words(words).persist()
    try:
        if words.count() <= LOCAL_VOCAB_MAX:
            rows = words.collect()
            wc = {r["word"]: r["n"] for r in rows}
            _, states = _bpe_train_local(wc, n_merges)
            return arrow_local_df(
                words.sparkSession,
                [
                    (
                        w,
                        "/" + "/".join(syms) + "/",
                        wc[w],
                        len(syms),
                    )
                    for w, syms in states.items()
                ],
                "word string, state string, n long, n_tokens long",
            )
        states, _ = _bpe_iterate(words, n_merges)
        out = states.select(
            "word",
            "state",
            "n",
            (
                F.length("state")
                - F.length(F.expr("replace(state, '/', '')"))
                - F.lit(1)
            )
            .cast("long")
            .alias("n_tokens"),
        ).localCheckpoint(eager=True)
        states.unpersist()
        return out
    finally:
        words.unpersist()
