"""Property tests (SURVEY §5.2.3): text/dedup operators vs pure-Python
references over randomized inputs, plus pure-driver properties of the
stats/sampling/packing helpers. Each Spark example ships a whole batch
of documents through one job to keep runtime sane.
"""

from __future__ import annotations

import math
import hashlib
import re

from hypothesis import given, settings, strategies as st

from clickhouse_only_importer_prototype_spark.operators.dedup import (
    ngram_jaccard_pairs,
)
from clickhouse_only_importer_prototype_spark.operators.text import (
    shingles,
    token_count,
    winnow_fingerprints,
)

WORDS = st.text(
    alphabet=st.sampled_from("abcXYZ09.,!?"), min_size=1, max_size=6
)
TEXTS = st.lists(
    st.lists(WORDS, min_size=0, max_size=30).map(" ".join),
    min_size=1,
    max_size=12,
)


def _norm_py(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _toks(s: str) -> list[str]:
    n = _norm_py(s)
    return n.split(" ") if n else []


def _shingles_py(s: str, n: int) -> set[str]:
    t = _toks(s)
    # mirrors the operator: split("") -> [""], shingle "" filtered out
    raw = _norm_py(s).split(" ")
    return {
        " ".join(raw[i : i + n])
        for i in range(len(raw) - n + 1)
        if " ".join(raw[i : i + n])
    }


def _winnow_py(s: str, k: int, w: int) -> set[int]:
    raw = _norm_py(s).split(" ")
    grams = [" ".join(raw[i : i + k]) for i in range(len(raw) - k + 1)]
    if not grams:
        grams = [_norm_py(s)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_token_count_matches_python(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n
        for r in df.select("doc_id", token_count(df.text).alias("n")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == len(_toks(t)), repr(t)


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_shingles_match_python(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, set[str]] = {i: set() for i in range(len(texts))}
    for r in shingles(df, n=3).collect():
        got[r.doc_id].add(r.shingle)
    for i, t in enumerate(texts):
        assert got[i] == _shingles_py(t, 3), repr(t)


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_winnow_matches_python(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, set[int]] = {i: set() for i in range(len(texts))}
    for r in winnow_fingerprints(df, k=4, w=5).collect():
        got[r.doc_id].add(r.fp)
    for i, t in enumerate(texts):
        assert got[i] == _winnow_py(t, 4, 5), repr(t)


@settings(max_examples=4, deadline=None)
@given(TEXTS)
def test_jaccard_pairs_match_python(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard_per_1000
        for r in ngram_jaccard_pairs(df, n=2, threshold=0.3).collect()
    }
    sets = {i: _shingles_py(t, 2) for i, t in enumerate(texts)}
    expect = {}
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            j1000 = 1000 * inter // len(sets[a] | sets[b])
            if j1000 >= 300:
                expect[(a, b)] = j1000
    assert got == expect


EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),     # key
        st.integers(min_value=0, max_value=100),   # ts
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=5, deadline=None)
@given(EVENTS, EVENTS)
def test_asof_join_matches_bisect(spark, left_rows, right_rows):
    import bisect

    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "lid long, k long, ts long",
    )
    # dedup right side per (k, ts): asof requires unique right keys
    rmap = {}
    for k, t in right_rows:
        rmap[(k, t)] = float(k * 1000 + t)
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rmap.items()] or [(99, 0, 0.0)],
        "k long, ts long, rval double",
    )
    got = {
        r.lid: (r.r_ts, r.r_rval)
        for r in asof_join(left, right, on=["k"]).collect()
    }
    by_key: dict[int, list[int]] = {}
    for (k, t) in rmap:
        by_key.setdefault(k, []).append(t)
    for ts_list in by_key.values():
        ts_list.sort()
    for i, (k, t) in enumerate(left_rows):
        cands = by_key.get(k, [])
        pos = bisect.bisect_right(cands, t) - 1
        expect = (
            (cands[pos], rmap[(k, cands[pos])]) if pos >= 0 else (None, None)
        )
        assert got[i] == expect, (i, k, t)

    # forward direction against the mirrored bisect reference
    fwd = {
        r.lid: (r.r_ts, r.r_rval)
        for r in asof_join(
            left, right, on=["k"], direction="forward"
        ).collect()
    }
    for i, (k, t) in enumerate(left_rows):
        cands = by_key.get(k, [])
        pos = bisect.bisect_left(cands, t)
        expect = (
            (cands[pos], rmap[(k, cands[pos])])
            if pos < len(cands)
            else (None, None)
        )
        assert fwd[i] == expect, ("forward", i, k, t)


@settings(max_examples=5, deadline=None)
@given(EVENTS, EVENTS)
def test_interval_join_matches_python(spark, point_rows, interval_rows):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        interval_join,
    )

    # sentinel rows for the empty case use disjoint keys so they never join
    points = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(point_rows)] or [(0, 98, 0)],
        "pid long, k long, t long",
    )
    intervals = spark.createDataFrame(
        [(i, k, t, t + 13) for i, (k, t) in enumerate(interval_rows)]
        or [(0, 99, 0, 1)],
        "iid long, k long, t0 long, t1 long",
    )
    got = {
        (r.iid, r.pid)
        for r in interval_join(
            points, intervals, on=["k"], point_ts="t",
            start_col="t0", end_col="t1", bucket_width=7,
        ).collect()
    }
    expect = {
        (ii, pi)
        for ii, (ik, it) in enumerate(interval_rows)
        for pi, (pk, pt) in enumerate(point_rows)
        if ik == pk and it <= pt < it + 13
    }
    assert got == expect


# ---- pure-driver properties (no Spark session in the loop) ----------------

SEGMENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # min
        st.integers(min_value=0, max_value=5_000),   # extent
        st.integers(min_value=1, max_value=100_000), # rows
    ).map(lambda t: (t[0], t[0] + t[1], t[2])),
    min_size=1,
    max_size=40,
)


@given(SEGMENTS, st.integers(min_value=2, max_value=64))
def test_boundaries_from_stats_invariants(segs, n_buckets):
    from clickhouse_only_importer_prototype_spark import stats

    bounds = stats.boundaries_from_stats(segs, n_buckets)
    # sorted, unique, at most n-1, inside the observed key domain
    assert bounds == sorted(set(bounds))
    assert len(bounds) <= n_buckets - 1
    if bounds:
        lo = min(s[0] for s in segs)
        hi = max(s[1] for s in segs)
        assert lo <= bounds[0] and bounds[-1] <= hi + 1


@given(
    st.lists(st.integers(min_value=0, max_value=2_000), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=999),
)
def test_packing_reference_invariants(token_counts, budget):
    """The concat-then-chunk layout the operator implements (checked
    against Spark separately in test_sampling_packing): offsets are
    gapless, sequence spans are monotone and within budget geometry."""
    acc = 0
    prev_last = 0
    for n in token_counts:
        first = acc // budget
        last = (acc + max(n, 1) - 1) // budget
        assert first <= last
        # a doc spans ceil(n/budget)+{0,1} sequences (straddle slack)
        assert last - first <= max(n, 1) // budget + 1
        assert first >= prev_last - 1 if prev_last else True
        prev_last = last
        acc += n


@given(st.lists(st.floats(min_value=0.0, max_value=1.0), min_size=1, max_size=5))
def test_hash_split_cuts_partition_the_bucket_space(weights):
    """Cut construction covers [0, 10000) without overlap regardless of
    weight vector (the Spark side is a pure projection over these)."""
    from clickhouse_only_importer_prototype_spark.operators.sampling import BUCKETS

    total = sum(weights)
    names = [f"w{i}" for i in range(len(weights))]
    acc = 0.0
    cuts = []
    for w in weights:
        lo = round(acc * BUCKETS)
        acc += w
        hi = round(acc * BUCKETS)
        cuts.append((lo, hi))
    for (lo1, hi1), (lo2, hi2) in zip(cuts, cuts[1:]):
        assert hi1 == lo2  # contiguous
        assert lo1 <= hi1 and lo2 <= hi2
    if total <= 1.0:
        assert cuts[-1][1] <= BUCKETS + 1


# ---- CDC merge vs a pure-Python MERGE reference ----------------------

CHANGE_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),        # key
        st.sampled_from(["I", "U", "D"]),              # op
        st.integers(min_value=0, max_value=50),        # raw seq (deduped below)
        st.integers(min_value=-100, max_value=100),    # payload
    ),
    min_size=0,
    max_size=25,
)
BASE_ROWS = st.dictionaries(
    st.integers(min_value=0, max_value=15),
    st.integers(min_value=-100, max_value=100),
    max_size=12,
)


def _merge_py(base: dict, changes: list) -> dict:
    latest: dict = {}
    for k, op, seq, v in changes:
        if k not in latest or seq > latest[k][0]:
            latest[k] = (seq, op, v)
    out = dict(base)
    for k, (_, op, v) in latest.items():
        if op == "D":
            out.pop(k, None)
        else:
            out[k] = v
    return out


@settings(max_examples=5, deadline=None)
@given(BASE_ROWS, CHANGE_ROWS)
def test_merge_changes_matches_python_merge(spark, base_map, change_rows):
    from clickhouse_only_importer_prototype_spark.operators import cdc

    # make seq unique per key (the operator's documented contract)
    seen: dict = {}
    changes = []
    for k, op, _, v in change_rows:
        seen[k] = seen.get(k, -1) + 1
        changes.append((k, op, seen[k], v))
    base = spark.createDataFrame(
        list(base_map.items()) or [(None, None)], "k long, v long"
    )
    if not base_map:
        base = base.where("k is not null")
    ch = spark.createDataFrame(
        changes or [(None, None, None, None)],
        "k long, op string, seq long, v long",
    )
    if not changes:
        ch = ch.where("k is not null")
    got = {r.k: r.v for r in cdc.merge_changes(base, ch, ["k"]).collect()}
    assert got == _merge_py(base_map, changes)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 99)), max_size=12),
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 99)), max_size=6),
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 99)), max_size=12),
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 99)), max_size=6),
)
def test_join_delta_identity_over_random_slices(spark, bl, dl, br, dr):
    """old ∪ join_delta == full join, exactly and without overlap, for
    arbitrary append slices on both sides (multiset semantics: dup
    keys multiply)."""
    from clickhouse_only_importer_prototype_spark.operators.incremental import (
        join_delta,
    )

    mk = lambda rows, v: spark.createDataFrame(
        [(k, k * 1000 + x) for k, x in rows] or [(-1, 0)],
        f"k long, {v} long",
    )
    base_l, delta_l = mk(bl, "lv"), mk(dl, "lv")
    base_r, delta_r = mk(br, "rv"), mk(dr, "rv")
    full = sorted(
        map(
            tuple,
            base_l.unionByName(delta_l)
            .join(base_r.unionByName(delta_r), "k")
            .collect(),
        )
    )
    old = base_l.join(base_r, "k").collect()
    delta = join_delta(base_l, delta_l, base_r, delta_r, "k").collect()
    assert sorted(map(tuple, old + delta)) == full


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40)),
        min_size=1,
        max_size=20,
    ),
    st.integers(1, 120),
)
def test_token_budget_is_greedy_hash_prefix(spark, rows, budget):
    """Kept docs per group are EXACTLY the maximal prefix of the
    salted-hash order whose running token total fits the budget."""
    from clickhouse_only_importer_prototype_spark.operators.sampling import (
        token_budget_per_group,
    )

    df = spark.createDataFrame(
        [(i, f"s{g}", n) for i, (g, n) in enumerate(rows)],
        "doc_id long, source string, n_tokens long",
    )
    kept = {
        r.doc_id
        for r in token_budget_per_group(
            df, budget_tokens=budget, token_col="n_tokens"
        ).collect()
    }
    order_key = lambda i: (
        hashlib.md5(f"budget-v1:{i}".encode()).hexdigest(),
        i,
    )
    by_group: dict[str, list[tuple[int, int]]] = {}
    for i, (g, n) in enumerate(rows):
        by_group.setdefault(f"s{g}", []).append((i, n))
    expect = set()
    for members in by_group.values():
        members.sort(key=lambda m: order_key(m[0]))
        cum = 0
        for i, n in members:
            cum += n
            if cum > budget:
                break
            expect.add(i)
    assert kept == expect


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g0", "g1", "g2"]),
            st.sampled_from("abcdefgh"),
        ),
        min_size=3,
        max_size=60,
    )
)
def test_tv_distance_is_a_metric_and_bounded(spark, rows):
    """group_tv_distance: 0 <= tv <= 1e6, and the triangle inequality
    holds for total variation — checked on the integer-share variant
    with a +2 floor-dust allowance (each share floors away < 1 unit
    per term; the correction terms add at most 2 units across a
    triangle)."""
    from clickhouse_only_importer_prototype_spark.operators.profile import (
        group_tv_distance,
    )

    df = spark.createDataFrame(rows, "g string, tok string")
    got = {
        (r.group_a, r.group_b): r.tv_1e6
        for r in group_tv_distance(df, "g", "tok").collect()
    }
    present = sorted({g for g, _ in rows})
    assert len(got) == len(present) * (len(present) - 1) // 2
    for v in got.values():
        assert 0 <= v <= 1_000_000

    def d(x, y):
        return got[(min(x, y), max(x, y))]

    if len(present) == 3:
        a, b, c = present
        assert d(a, c) <= d(a, b) + d(b, c) + 2
        assert d(a, b) <= d(a, c) + d(b, c) + 2
        assert d(b, c) <= d(a, b) + d(a, c) + 2


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.sampled_from("abcdefghijklmnop"), min_size=5, max_size=400),
    st.integers(min_value=2, max_value=12),
)
def test_heavy_hitters_exact_for_any_den(spark, toks, den):
    """heavy_hitters == brute-force exact >= total/den set, whatever
    the distribution and threshold hypothesis picks (the MG
    nomination's superset guarantee + exact rescore, end to end)."""
    from collections import Counter

    from clickhouse_only_importer_prototype_spark.operators import sketches

    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r.token: r.n_occurrences
        for r in sketches.heavy_hitters(
            df.repartition(4), "tok", den=den
        ).collect()
    }
    total = len(toks)
    expect = {
        t: n for t, n in Counter(toks).items() if n * den >= total
    }
    assert got == expect


def test_weighted_median_clears_half_weight_python_reference(spark, sf_dir):
    """weighted_median_price == the brute-force python weighted median
    (lower convention) on the same data."""
    from clickhouse_only_importer_prototype_spark import queries as q

    got = {
        r.l_returnflag: (r.total_weight, r.weighted_median_cents)
        for r in q.weighted_median_price(spark, sf_dir).collect()
    }
    li = q.load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    import collections
    acc = collections.defaultdict(collections.Counter)
    for r in li.collect():
        cents = int(round(r.l_extendedprice * 100))
        acc[r.l_returnflag][cents] += int(r.l_quantity)
    for flag, cnt in acc.items():
        total = sum(cnt.values())
        cum = 0
        for price in sorted(cnt):
            cum += cnt[price]
            if 2 * cum >= total:
                assert got[flag] == (total, price), flag
                break


def test_chisq_expr_matches_manual_statistic(spark):
    """_CHISQ_EXPR on a hand-checked 2x4 table: chi2 = 6.7490...
    (sum of (O-E)^2/E over all 8 cells) -> floor(1000x) = 6749."""
    from clickhouse_only_importer_prototype_spark import queries as q

    df = spark.createDataFrame(
        [(100, 30, 120, 45, 90, 20, 110, 40)],
        "n0 long, c0 long, n1 long, c1 long, n2 long, c2 long, "
        "n3 long, c3 long",
    ).selectExpr("*", "n0+n1+n2+n3 AS nn", "c0+c1+c2+c3 AS cc")
    from pyspark.sql import functions as F

    got = df.select(F.expr(q._CHISQ_EXPR).alias("chi2")).collect()[0].chi2
    assert got == 6749


def test_lang_chi2_tokens_matches_python_reference(spark, sf_dir):
    """lang_chi2_tokens == brute-force python chi2 over the same
    tokenization: identical cells, identical closed form, identical
    top-3-per-lang pick (chi2 desc, token asc)."""
    import collections
    import math

    from clickhouse_only_importer_prototype_spark import queries as q

    got = [
        (r.lang, r.token, r.n_in_lang, r.chi2_milli)
        for r in q.lang_chi2_tokens(spark, sf_dir).collect()
    ]

    docs = q.load(spark, sf_dir, "documents").select("lang", "text").collect()
    cells: dict[tuple[str, str], int] = collections.Counter()
    for r in docs:
        toks = re.sub(r"\s+", " ", (r.text or "").lower()).strip().split(" ")
        for t in toks:
            if t:
                cells[(r.lang, t)] += 1
    row_t = collections.Counter()
    col_l = collections.Counter()
    for (lang, tok), n in cells.items():
        row_t[tok] += n
        col_l[lang] += n
    nn = sum(cells.values())
    best: dict[str, list] = collections.defaultdict(list)
    for (lang, tok), a in cells.items():
        rt, cl = row_t[tok], col_l[lang]
        if a < 5 or nn - rt <= 0 or nn - cl <= 0 or a * nn <= rt * cl:
            continue
        det = float(a) * float(nn - rt - cl + a) - float(rt - a) * float(
            cl - a
        )
        chi2 = (float(nn) * det * det) / (
            float(rt) * float(nn - rt) * float(cl) * float(nn - cl)
        )
        best[lang].append((-math.floor(chi2 * 1000), tok, a))
    expect = []
    for lang, rows in best.items():
        for neg, tok, a in sorted(rows)[:3]:
            expect.append((lang, tok, a, -neg))
    assert sorted(got) == sorted(expect)


def test_curriculum_order_gapless_and_quality_descending(spark, sf_dir):
    """train_order is a gapless 0..n-1 permutation; walking it in
    order, quality_score never increases (curriculum contract); ties
    within a quality level follow the salted md5 shuffle key."""
    from clickhouse_only_importer_prototype_spark import queries as q

    rows = q.curriculum_order(spark, sf_dir).collect()
    orders = sorted(r.train_order for r in rows)
    assert orders == list(range(len(rows)))
    seq = sorted(rows, key=lambda r: r.train_order)
    quals = [r.quality_score for r in seq]
    assert quals == sorted(quals, reverse=True)

    def h32(doc_id: int) -> int:
        return int(
            hashlib.md5(f"curr-v1:{doc_id}".encode()).hexdigest()[:8], 16
        )

    keys = [(-r.quality_score, h32(r.doc_id), r.doc_id) for r in seq]
    assert keys == sorted(keys)


def test_mixture_temperature_flattens_zipf(spark, sf_dir):
    """sqrt-temperature rebalancing: bigger sources keep bigger
    targets, but their share RATIO shrinks vs the raw token ratio;
    epochs_milli is exactly div(target*1000, avail)."""
    from clickhouse_only_importer_prototype_spark import queries as q

    rows = sorted(
        q.mixture_temperature(spark, sf_dir).collect(),
        key=lambda r: r.n_avail,
    )
    assert rows, "no sources"
    for r in rows:
        assert r.epochs_milli == (r.target_tokens * 1000) // r.n_avail
        assert r.oversampled == (r.epochs_milli > 1000)
    small, big = rows[0], rows[-1]
    if big.n_avail > small.n_avail:
        assert big.share_1e6 >= small.share_1e6
        # flattening: share ratio strictly below the raw size ratio
        assert (
            big.share_1e6 * small.n_avail < small.share_1e6 * big.n_avail
        )
    total = sum(r.n_avail for r in rows)
    # 2x budget conserved up to per-source floor rounding
    assert sum(r.target_tokens for r in rows) <= 2 * total
    assert sum(r.target_tokens for r in rows) >= 2 * total - 2 * len(rows)


def test_token_freq_of_freqs_mass_conservation(spark, sf_dir):
    """sum(freq * n_types) == sum(n_occurrences) == total token
    occurrences counted directly off the corpus."""
    from clickhouse_only_importer_prototype_spark import queries as q

    rows = q.token_freq_of_freqs(spark, sf_dir).collect()
    assert sum(r.freq * r.n_types for r in rows) == sum(
        r.n_occurrences for r in rows
    )
    docs = q.load(spark, sf_dir, "documents").select("text").collect()
    total = 0
    for r in docs:
        toks = re.sub(r"\s+", " ", (r.text or "").lower()).strip().split(" ")
        total += sum(1 for t in toks if t)
    assert sum(r.n_occurrences for r in rows) == total


def test_bm25_matches_python_reference(spark, sf_dir):
    """bm25_topdocs == a brute-force python BM25 with the same
    rational idf, constants, integer avgdl, and floor-before-sum."""
    import collections
    import math

    from clickhouse_only_importer_prototype_spark import queries as q

    got = [
        (r.doc_id, r.bm25_micro)
        for r in q.bm25_topdocs(spark, sf_dir).collect()
    ]

    docs = q.load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {
        r.doc_id: [
            t
            for t in re.sub(r"\s+", " ", (r.text or "").lower())
            .strip()
            .split(" ")
            if t
        ]
        for r in docs
    }
    dl = {d: len(ts) for d, ts in toks.items() if ts}
    n_docs = len(dl)
    avgdl = sum(dl.values()) // n_docs
    dfreq = collections.Counter()
    for ts in toks.values():
        for t in set(ts):
            dfreq[t] += 1
    terms = sorted(
        ((t, df) for t, df in dfreq.items() if 2 * df <= n_docs),
        key=lambda kv: (-kv[1], kv[0]),
    )[:3]
    scores = collections.Counter()
    for d, ts in toks.items():
        cnt = collections.Counter(ts)
        for t, df in terms:
            tf = cnt.get(t, 0)
            if not tf:
                continue
            idf = (float(n_docs - df) + 0.5) / (float(df) + 0.5)
            sat = (float(tf) * 2.2) / (
                float(tf) + 1.2 * (0.25 + 0.75 * (float(dl[d]) / float(avgdl)))
            )
            scores[d] += math.floor(idf * sat * 1000000.0)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == expect


def test_sma_decomposition_identity_and_edges(spark, sf_dir):
    """trend + seasonal + residual == n_events*1000 exactly on every
    row; only full 25-hour windows survive (12 rows drop per series
    edge); seasonal is constant within (type, hour-of-day)."""
    from clickhouse_only_importer_prototype_spark import queries as q

    rows = q.events_sma_decomposition(spark, sf_dir).collect()
    assert rows
    seasonal_by = {}
    for r in rows:
        assert (
            r.trend_milli + r.seasonal_milli + r.residual_milli
            == r.n_events * 1000
        )
        key = (r.event_type, r.bucket % 24)
        seasonal_by.setdefault(key, set()).add(r.seasonal_milli)
    assert all(len(v) == 1 for v in seasonal_by.values())

    dense = q.events_gap_filled_hourly(spark, sf_dir).collect()
    spans = {}
    for r in dense:
        spans[r.event_type] = spans.get(r.event_type, 0) + 1
    expect_rows = sum(max(n - 24, 0) for n in spans.values())
    assert len(rows) == expect_rows


def test_fd_audit_verdicts(spark, sf_dir):
    """Key-determined FDs hold (o_orderkey -> o_orderdate, c_name ->
    c_nationkey); low-cardinality determinants are violated; holds
    <=> extra_rhs == 0."""
    from clickhouse_only_importer_prototype_spark import queries as q

    rows = {
        (r.table_name, r.determinant, r.dependent): r
        for r in q.fd_audit(spark, sf_dir).collect()
    }
    assert len(rows) == 5
    assert rows[("orders", "o_orderkey", "o_orderdate")].holds
    assert rows[("customer", "c_name", "c_nationkey")].holds
    assert not rows[("lineitem", "l_returnflag", "l_linestatus")].holds
    for r in rows.values():
        assert r.extra_rhs >= 0
        assert r.holds == (r.extra_rhs == 0)
        assert r.n_pairs >= r.n_lhs


def test_mannwhitney_matches_python_reference(spark, sf_dir):
    """mannwhitney_quality == a python tie-corrected MWU (2x-rank
    integers, identical z closed form) per source vs rest."""
    import collections
    import math

    from clickhouse_only_importer_prototype_spark import queries as q

    got = {
        r.source: (r.n_s, r.u2_s, r.z_milli)
        for r in q.mannwhitney_quality(spark, sf_dir).collect()
    }
    docs = q.load(spark, sf_dir, "documents").select(
        "source", "n_chars"
    ).collect()
    vals = collections.Counter(r.n_chars for r in docs)
    rank2 = {}
    c_prev = 0
    for v in sorted(vals):
        rank2[v] = 2 * c_prev + vals[v] + 1
        c_prev += vals[v]
    nn = len(docs)
    tie3 = sum(m**3 - m for m in vals.values())
    by_src = collections.defaultdict(list)
    for r in docs:
        by_src[r.source].append(r.n_chars)
    for src, xs in by_src.items():
        n_s = len(xs)
        r2 = sum(rank2[x] for x in xs)
        u2 = r2 - n_s * (n_s + 1)
        z = (float(u2) - float(n_s * (nn - n_s))) / math.sqrt(
            (float(n_s) * float(nn - n_s) / 3.0)
            * (float(nn + 1) - float(tie3) / (float(nn) * float(nn - 1)))
        )
        assert got[src] == (n_s, u2, math.floor(z * 1000.0)), src


def test_curriculum_shuffle_audit_python_reference(spark, sf_dir):
    """observed/expected same-source adjacency rates match a python
    replay of the collected curriculum; n_pairs == n_docs - 1 (the
    order is a gapless permutation)."""
    import collections

    from clickhouse_only_importer_prototype_spark import queries as q

    row = q.curriculum_shuffle_audit(spark, sf_dir).collect()[0]
    cur = {
        r.doc_id: r.train_order
        for r in q.curriculum_order(spark, sf_dir).collect()
    }
    src = {
        r.doc_id: r.source
        for r in q.load(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    seq = [src[d] for d in sorted(cur, key=cur.get)]
    n = len(seq)
    assert row.n_docs == n and row.n_pairs == n - 1
    same = sum(1 for x, y in zip(seq, seq[1:]) if x == y)
    assert row.same_pairs == same
    counts = collections.Counter(seq)
    sum_nn1 = sum(c * (c - 1) for c in counts.values())
    assert row.observed_1e6 == same * 1000000 // (n - 1)
    assert row.expected_1e6 == sum_nn1 * 1000000 // (n * (n - 1))
    assert row.decorrelated == (
        row.observed_1e6 <= 2 * row.expected_1e6
    )


def test_order_reconciliation_python_reference(spark, sf_dir):
    """Header-vs-lines reconciliation matches an exact python replay
    in integer micro-cents."""
    import collections

    from clickhouse_only_importer_prototype_spark import queries as q

    row = q.order_reconciliation(spark, sf_dir).collect()[0]
    li = q.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_tax"
    ).collect()
    charge = collections.Counter()
    for r in li:
        cents = math.floor(r.l_extendedprice * 100 + 0.5)
        d = math.floor(r.l_discount * 1000 + 0.5)
        t = math.floor(r.l_tax * 1000 + 0.5)
        charge[r.l_orderkey] += cents * (1000 - d) * (1000 + t)
    orders = q.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    n_childless = n_mismatch = 0
    max_rel = None
    for r in orders:
        total_cents = math.floor(r.o_totalprice * 100 + 0.5)
        if r.o_orderkey not in charge:
            n_childless += 1
            continue
        diff = abs(charge[r.o_orderkey] - total_cents * 1000000)
        if diff * 100 > total_cents * 1000000:
            n_mismatch += 1
        rel = diff // total_cents
        max_rel = rel if max_rel is None else max(max_rel, rel)
    assert (
        row.n_orders,
        row.n_childless,
        row.n_mismatch_1pct,
        row.max_rel_diff_1e6,
    ) == (len(orders), n_childless, n_mismatch, max_rel)


def test_join_cardinality_estimate_python_reference(spark, sf_dir):
    """The key-sampled estimate matches a python replay (same md5
    sample, same x10 scale-up) and the true count is the real join
    size."""
    import collections

    from clickhouse_only_importer_prototype_spark import queries as q

    row = q.join_cardinality_estimate(spark, sf_dir).collect()[0]
    orders = [
        r.o_custkey
        for r in q.load(spark, sf_dir, "orders").select("o_custkey").collect()
    ]
    custs = {
        r.c_custkey
        for r in q.load(spark, sf_dir, "customer")
        .select("c_custkey")
        .collect()
    }
    true_n = sum(1 for k in orders if k in custs)

    def sampled(k: int) -> bool:
        h = int(hashlib.md5(f"jce-v1:{k}".encode()).hexdigest()[:15], 16)
        return h % 100 < 10

    est = 10 * sum(1 for k in orders if k in custs and sampled(k))
    assert (row.n_true, row.n_est) == (true_n, est)
    assert row.err_1e4 == abs(est - true_n) * 10000 // true_n


def test_benford_audit_python_reference(spark, sf_dir):
    """Observed digit counts match a python replay of the integer-cent
    leading digit; shares sum to ~1e6 and pair with the fixed Benford
    constants."""
    import collections

    from clickhouse_only_importer_prototype_spark import queries as q

    rows = {r.digit: r for r in q.benford_price_audit(spark, sf_dir).collect()}
    got = {d: r.n for d, r in rows.items()}
    prices = q.load(spark, sf_dir, "orders").select("o_totalprice").collect()
    expect = collections.Counter(
        int(str(math.floor(r.o_totalprice * 100 + 0.5))[0])
        for r in prices
        if r.o_totalprice > 0
    )
    assert got == dict(expect)
    total = sum(got.values())
    assert all(
        r.observed_1e6 == r.n * 1000000 // total for r in rows.values()
    )
    assert {r.digit: r.benford_1e6 for r in rows.values()} == {
        d + 1: v for d, v in enumerate(q._BENFORD_1E6)
    }
    for r in rows.values():
        assert r.abs_gap_1e6 == abs(r.observed_1e6 - r.benford_1e6)


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_image_codecs_roundtrip(w, h, data):
    """Pure-driver codec properties: encode->decode is identity for
    BOTH real formats at any dims (incl. stride-padding widths), and
    the dispatch picks the right decoder."""
    from clickhouse_only_importer_prototype_spark.operators.multimodal import (
        encode_bmp,
        encode_ppm,
        try_decode_bmp,
        try_decode_image,
        try_decode_ppm,
    )

    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=3 * w * h, max_size=3 * w * h
            )
        )
    )
    assert try_decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)
    assert try_decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)
    assert try_decode_image(encode_ppm(w, h, rgb)) == (w, h, rgb)
    assert try_decode_image(encode_bmp(w, h, rgb)) == (w, h, rgb)


@given(payload=st.binary(max_size=200))
@settings(max_examples=120, deadline=None)
def test_image_decoders_total_on_garbage(payload):
    """Decoders are TOTAL: arbitrary bytes (including truncated headers
    and magic-prefixed junk) either parse to a well-formed image or
    return None — never raise. The quarantine path ('skip') depends on
    this."""
    from clickhouse_only_importer_prototype_spark.operators.multimodal import (
        try_decode_image,
    )

    for prefix in (b"", b"P6", b"BM", b"P6\n2 2\n255\n", b"BM" + b"\x00" * 40):
        out = try_decode_image(prefix + payload)
        if out is not None:
            w, h, rgb = out
            assert w > 0 and h > 0 and len(rgb) == 3 * w * h


# ---------------------------------------------------------------------------
# Container-codec round-trip properties (pure Python — no Spark session)
# ---------------------------------------------------------------------------

_FRAMES = st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=8)


@given(
    frames=_FRAMES,
    upf=st.integers(min_value=1, max_value=1_000_000),
    w=st.integers(min_value=1, max_value=4096),
    h=st.integers(min_value=1, max_value=4096),
)
@settings(max_examples=200, deadline=None)
def test_avi_roundtrip_property(frames, upf, w, h):
    """encode_avi -> try_parse_avi is the identity on every container
    statistic, for ANY frame sizes (odd sizes exercise word-alignment
    padding), and every reported byte range slices back to the exact
    original frame."""
    from clickhouse_only_importer_prototype_spark.operators.multimodal import (
        encode_avi, try_parse_avi,
    )

    p = encode_avi(upf, w, h, frames)
    v = try_parse_avi(p)
    assert v is not None
    assert (v["us_per_frame"], v["width"], v["height"]) == (upf, w, h)
    assert v["hdr_frames"] == len(frames) == len(v["frames"])
    assert v["stream_frames"] == len(frames)
    assert v["idx1_ok"] == 1 and v["audio"] == []
    for (off, sz, ck), f in zip(v["frames"], frames):
        assert p[off : off + sz] == f
        assert ck == sum(f)
    # truncating anywhere strictly inside the container never parses
    # as a well-formed AVI of the same shape (either rejected, or a
    # prefix whose chunks all still verify)
    cut = try_parse_avi(p[: max(12, len(p) - 1)])
    assert cut is None or len(cut["frames"]) <= len(frames)


@given(
    pairs=st.lists(
        st.tuples(
            st.binary(min_size=0, max_size=48),
            st.binary(min_size=0, max_size=24),
        ),
        min_size=0,
        max_size=6,
    ),
    upf=st.integers(min_value=1, max_value=100_000),
)
@settings(max_examples=150, deadline=None)
def test_avi_av_roundtrip_property(pairs, upf):
    """Two-stream containers: interleave order, per-stream byte ranges
    and checksums, and the whole-index idx1 verdict all survive the
    round trip for arbitrary (video, audio) chunk pairs."""
    from clickhouse_only_importer_prototype_spark.operators.multimodal import (
        encode_avi, try_parse_avi,
    )

    frames = [f for f, _ in pairs]
    audio = [a for _, a in pairs]
    p = encode_avi(upf, 16, 8, frames, audio)
    v = try_parse_avi(p)
    assert v is not None and v["idx1_ok"] == 1
    assert v["kinds"] == b"va" * len(pairs)
    for (off, sz, ck), f in zip(v["frames"], frames):
        assert p[off : off + sz] == f and ck == sum(f)
    for (off, sz, ck), a in zip(v["audio"], audio):
        assert p[off : off + sz] == a and ck == sum(a)


# ---- TSV parity edges (round-7 verdict #8): adversarial headers ----
#
# The reference's header handling is fragile on these shapes
# (cna/reader.go:22 splits the first line naively: duplicate sample
# names collide in the by-name map, a trailing \r stays inside the
# last column name, a comment-only MAF loops to EOF). The engine's
# DOCUMENTED behavior, pinned here like the sorted-path-order
# deviation: data cells always survive POSITIONALLY; Spark
# disambiguates duplicate header names (suffix = column index) and
# names empty header cells _cN, so the pivot/melt contracts hold on
# inputs the reference mis-parses; \r\n is folded (no \r in names or
# values); comment-only and empty files read as empty frames, not
# crashes.


@st.composite
def _adversarial_cna(draw):
    n_genes = draw(st.integers(1, 5))
    n_samples = draw(st.integers(0, 4))
    genes = draw(
        st.lists(
            st.text(alphabet="ABCXYZ", min_size=1, max_size=4),
            min_size=n_genes,
            max_size=n_genes,
            unique=True,
        )
    )
    cells = [
        [
            draw(st.text(alphabet="ab-012", min_size=0, max_size=3))
            for _ in range(n_samples)
        ]
        for _ in range(n_genes)
    ]
    edges = draw(
        st.sets(st.sampled_from(["dup", "empty_hdr", "crlf"]))
    )
    return genes, cells, sorted(edges)


@settings(max_examples=15, deadline=None)
@given(_adversarial_cna())
def test_cna_pivot_melt_survive_adversarial_headers(spark, matrix):
    import os
    import shutil
    import tempfile

    from clickhouse_only_importer_prototype_spark.operators import cna
    from clickhouse_only_importer_prototype_spark.sources import (
        tsv as tsv_src,
    )

    genes, cells, edges = matrix
    n_samples = len(cells[0]) if cells else 0
    headers = [f"S{i + 1}" for i in range(n_samples)]
    if "dup" in edges and n_samples >= 2:
        headers[1] = headers[0]  # duplicate sample column name
    if "empty_hdr" in edges and n_samples >= 1:
        headers[-1] = ""  # empty header cell
    eol = "\r\n" if "crlf" in edges else "\n"
    lines = ["\t".join(["Hugo_Symbol", "Entrez_Gene_Id"] + headers)]
    for g, row in zip(genes, cells):
        lines.append("\t".join([g, "7157"] + row))
    d = tempfile.mkdtemp(prefix="tsv_edge_")
    try:
        path = os.path.join(d, "data_cna.txt")
        with open(path, "w", newline="") as fh:
            fh.write(eol.join(lines) + eol)
        df = tsv_src.read_cna_matrix(spark, path)
        # positional survival: column count and no \r contamination
        assert len(df.columns) == 2 + n_samples
        assert not any("\r" in c for c in df.columns)
        # pivot-concat: VALUES is the comma-join of row cells in file
        # order, regardless of header naming tricks
        ga = {
            r.GENE_SYMBOL: r.VALUES
            for r in cna.genetic_alterations(df, "st", "pf").collect()
        }
        assert ga == {g: ",".join(row) for g, row in zip(genes, cells)}
        # melt: genes x samples rows; per-gene multiset of alterations
        # equals the row's cells
        der = cna.cna_derived(df, "st", "pf").collect()
        assert len(der) == len(genes) * n_samples
        by_gene = {}
        for r in der:
            assert "\r" not in r.ALTERATION and "\r" not in r.SAMPLE_ID
            by_gene.setdefault(r.GENE_SYMBOL, []).append(r.ALTERATION)
        for g, row in zip(genes, cells):
            assert sorted(by_gene.get(g, [])) == sorted(row)
        # sample list: 1 row, n_samples entries, all study-prefixed,
        # names unique even when the header repeats them
        [sl] = cna.genetic_profile_samples(spark, df, "st", "pf").collect()
        parts = sl.ORDERED_SAMPLE_LIST.split(",") if n_samples else []
        assert len(parts) == n_samples
        assert all(p.startswith("st_") for p in parts)
        assert len(set(parts)) == n_samples
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tsv_degenerate_files_read_empty(spark, tmp_path):
    """Comment-only MAF and fully empty files: the reference's header
    scan loops to EOF / errors (mutation/reader.go:19-45); the engine
    reads an empty zero-column frame and downstream per-file error
    isolation (D4) keeps the run alive. Pinned as documented
    behavior."""
    from clickhouse_only_importer_prototype_spark.sources import (
        tsv as tsv_src,
    )

    c = tmp_path / "data_mutations.txt"
    c.write_text("#only\n#comments here\n")
    df = tsv_src.read_maf(spark, str(c))
    assert df.columns == [] and df.count() == 0

    e = tmp_path / "data_cna.txt"
    e.write_text("")
    df = tsv_src.read_cna_matrix(spark, str(e))
    assert df.columns == [] and df.count() == 0


@settings(max_examples=15, deadline=None)
@given(_adversarial_cna())
def test_header_schema_matches_spark_inference(spark, matrix):
    """The driver-side header schema (sources/tsv._header_only_schema,
    the zero-jobs-per-file path) must produce column names IDENTICAL
    to Spark's own header inference on the adversarial corpus —
    duplicate names (index-suffixed, case-insensitive dup detection),
    empty cells (_cN), CRLF. Any divergence silently changes by-name
    projections, so this is the load-bearing pin for the fast path."""
    import os
    import shutil
    import tempfile

    from clickhouse_only_importer_prototype_spark.schemas import (
        TSV_READ_OPTIONS,
    )
    from clickhouse_only_importer_prototype_spark.sources import (
        tsv as tsv_src,
    )

    genes, cells, edges = matrix
    n_samples = len(cells[0]) if cells else 0
    headers = [f"S{i + 1}" for i in range(n_samples)]
    if "dup" in edges and n_samples >= 2:
        headers[1] = headers[0]
    if "empty_hdr" in edges and n_samples >= 1:
        headers[-1] = ""
    eol = "\r\n" if "crlf" in edges else "\n"
    lines = ["\t".join(["Hugo_Symbol", "Entrez_Gene_Id"] + headers)]
    for g, row in zip(genes, cells):
        lines.append("\t".join([g, "7157"] + row))
    d = tempfile.mkdtemp(prefix="tsv_hdr_")
    try:
        path = os.path.join(d, "data_cna.txt")
        with open(path, "w", newline="") as fh:
            fh.write(eol.join(lines) + eol)
        fast = tsv_src.read_cna_matrix(spark, path)
        inferred = spark.read.options(**TSV_READ_OPTIONS).csv(path)
        assert fast.columns == inferred.columns
        # values positional and identical through both paths
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, inferred.collect())
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
