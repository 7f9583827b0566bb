"""ANN index persistence (operators/ann_index.py): the train-once /
serve-many lifecycle must be BIT-IDENTICAL to the in-session path —
artifact round-trip exactness, prebuilt serving equality per variant,
and the frozen-codebook incremental-ingest posture."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhouse_only_importer_prototype_spark.operators import (
    ann_index as ai,
    similarity as sim,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def built(spark, emb, tmp_path_factory):
    """One artifact per kind, built once for the module."""
    root = tmp_path_factory.mktemp("ann_index")
    out = {}
    for kind in ("ivf", "pq", "ivfpq"):
        path = str(root / kind)
        out[kind] = (ai.build_ann_index(emb, path, kind, dim=64), path)
    return out


def test_roundtrip_bit_identity(built):
    """float64 centroids/codebooks must survive the parquet round-trip
    exactly — the precondition for every equality below."""
    for kind, (idx, path) in built.items():
        loaded = ai.load_ann_index(path)
        assert loaded.kind == kind and loaded.dim == 64
        if idx.centroids is None:
            assert loaded.centroids is None
        else:
            assert np.array_equal(idx.centroids, loaded.centroids)
        if idx.codebooks is None:
            assert loaded.codebooks is None
        else:
            assert np.array_equal(idx.codebooks, loaded.codebooks)


def test_codes_table_shape(spark, built, emb):
    n = emb.count()
    for kind, (_, path) in built.items():
        codes = ai.load_ann_index(path).codes(spark)
        assert codes.columns == ["vec_id", "cluster", "codes"]
        assert codes.count() == n
        rows = codes.limit(5).collect()
        for r in rows:
            if kind in ("ivf", "ivfpq"):
                assert r.cluster is not None
            else:
                assert r.cluster is None
            if kind in ("pq", "ivfpq"):
                assert r.codes is not None and len(r.codes) == 8
            else:
                assert r.codes is None


@pytest.mark.parametrize("kind", ["ivf", "pq", "ivfpq"])
def test_prebuilt_serving_equals_insession(spark, built, emb, kind):
    """Default build params mirror the serving defaults per kind, so a
    prebuilt serve must reproduce the in-session top-k row-for-row
    (training is seeded/partition-stable; no tolerance, exact
    equality)."""
    fn = {
        "ivf": sim.cosine_topk_ivf,
        "pq": sim.cosine_topk_pq,
        "ivfpq": sim.cosine_topk_ivfpq,
    }[kind]
    q = emb.where(F.col("vec_id") < 6)
    loaded = ai.load_ann_index(built[kind][1])
    insess = sorted(map(tuple, fn(emb, q, dim=64, k=5).collect()))
    served = sorted(
        map(tuple, fn(emb, q, dim=64, k=5, prebuilt=loaded).collect())
    )
    assert insess and insess == served


def test_prebuilt_kind_mismatch_raises(spark, built, emb):
    q = emb.where(F.col("vec_id") < 2)
    ivf_idx = ai.load_ann_index(built["ivf"][1])
    pq_idx = ai.load_ann_index(built["pq"][1])
    with pytest.raises(ValueError, match="no codebooks"):
        sim.cosine_topk_pq(emb, q, dim=64, prebuilt=ivf_idx)
    with pytest.raises(ValueError, match="no centroids"):
        sim.cosine_topk_ivf(emb, q, dim=64, prebuilt=pq_idx)
    with pytest.raises(ValueError, match="lacks centroids or codebooks"):
        sim.cosine_topk_ivfpq(emb, q, dim=64, prebuilt=pq_idx)


def test_prebuilt_dim_mismatch_raises(spark, built, emb):
    """ADVICE r9: dim drives subspace slicing and LUT shapes; a
    caller-passed dim that contradicts the artifact's meta must refuse
    loudly, not produce wrong slices or an opaque numpy shape error."""
    q = emb.where(F.col("vec_id") < 2)
    for kind, fn in (
        ("ivf", sim.cosine_topk_ivf),
        ("pq", sim.cosine_topk_pq),
        ("ivfpq", sim.cosine_topk_ivfpq),
    ):
        idx = ai.load_ann_index(built[kind][1])
        with pytest.raises(ValueError, match="built with dim=64"):
            fn(emb, q, dim=32, prebuilt=idx)


def test_compaction_refuses_nonlocal_path_and_parks_old(
    spark, emb, tmp_path
):
    """ADVICE r9 (medium): the compaction swap must never leave a
    window with NO codes table — the old table parks at __old__ until
    the new one is live, and the parked copy is gone after success;
    non-local paths (no os.rename semantics) are refused up front."""
    import dataclasses
    import os

    path = str(tmp_path / "cmp_swap")
    idx = ai.build_ann_index(emb.limit(200), path, "ivf", dim=64)
    ai.compact_ann_index(idx, spark)
    assert os.path.isdir(os.path.join(path, "codes.parquet"))
    assert not os.path.exists(os.path.join(path, "codes.parquet.__old__"))
    remote = dataclasses.replace(idx, path="s3://bucket/idx")
    with pytest.raises(ValueError, match="local filesystem path"):
        ai.compact_ann_index(remote, spark)


def test_bad_kind_and_version_rejected(spark, emb, tmp_path):
    with pytest.raises(ValueError, match="kind must be one of"):
        ai.build_ann_index(emb, str(tmp_path / "x"), "hnsw", dim=64)
    # future format version must fail loud, not misread
    import pyarrow.parquet as pq_io

    path = str(tmp_path / "v99")
    ai.build_ann_index(emb.limit(64), path, "ivf", dim=64)
    meta = pq_io.read_table(f"{path}/meta.parquet").to_pydict()
    meta["format_version"] = [99]
    import pyarrow as pa

    pq_io.write_table(pa.table(meta), f"{path}/meta.parquet")
    with pytest.raises(ValueError, match="newer than reader"):
        ai.load_ann_index(path)


def test_incremental_append_frozen_codebooks(spark, emb, tmp_path):
    """The production ingest posture: new vectors encode against the
    FROZEN codebooks/centroids and append to the codes table — no
    retrain, existing codes untouched — and a subsequent prebuilt
    serve sees them. An exact copy of a query vector appended under a
    new id must come back as its rank-1 neighbor."""
    path = str(tmp_path / "ivfpq_inc")
    idx = ai.build_ann_index(emb, path, "ivfpq", dim=64)
    before = {
        r.vec_id: (r.cluster, tuple(r.codes))
        for r in idx.codes(spark).collect()
    }

    qid = 3
    clone_id = 9_000_000 + qid
    clone = emb.where(F.col("vec_id") == qid).withColumn(
        "vec_id", F.lit(clone_id).cast(emb.schema["vec_id"].dataType)
    )
    ai.encode_new_vectors(idx, clone)

    after = {
        r.vec_id: (r.cluster, tuple(r.codes))
        for r in idx.codes(spark).collect()
    }
    assert len(after) == len(before) + 1
    for vid, enc in before.items():
        assert after[vid] == enc  # existing codes byte-stable
    # the clone's codes equal its source's codes: same vector, same
    # frozen codebooks -> identical encoding by determinism
    assert after[clone_id] == after[qid]

    # serve over the grown corpus + appended index: clone is rank 1
    grown = emb.unionByName(clone)
    loaded = ai.load_ann_index(path)
    q = emb.where(F.col("vec_id") == qid)
    top = sim.cosine_topk_ivfpq(
        grown, q, dim=64, k=3, prebuilt=loaded
    ).collect()
    best = min(top, key=lambda r: r.rank)
    assert best.neighbor_id == clone_id
    assert best.cos_1e6 >= 999_999  # exact copy -> cosine 1.0 (floor'd)


def test_codes_partitioned_by_cell_and_pruned(spark, built, emb):
    """ivf/ivfpq codes tables use the inverted-list LAYOUT (hive
    partition dir per cluster) and prebuilt serving carries a STATIC
    PartitionFilter on the probed cells — so the ADC/cell scan reads
    nprobe/n_centroids of the files, not just of the rows. Pure pq has
    no cell and stays flat."""
    import contextlib
    import io
    import os

    for kind in ("ivf", "ivfpq"):
        root = os.path.join(built[kind][1], "codes.parquet")
        assert any(n.startswith("cluster=") for n in os.listdir(root)), kind
    pq_root = os.path.join(built["pq"][1], "codes.parquet")
    assert not any(n.startswith("cluster=") for n in os.listdir(pq_root))

    q = emb.where(F.col("vec_id") < 3)
    loaded = ai.load_ann_index(built["ivfpq"][1])
    df = sim.cosine_topk_ivfpq(emb, q, dim=64, k=5, prebuilt=loaded)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    seg = plan[plan.index("codes.parquet"):]
    pf_line = next(
        ln for ln in seg.splitlines() if ln.startswith("PartitionFilters")
    )
    assert "cluster" in pf_line and "IN" in pf_line.upper(), pf_line


def test_staleness_audit_flags_ingest_lag_and_recovers(spark, emb, tmp_path):
    """The lifecycle's decision loop: an index built BEFORE the corpus
    grew caps its recall at indexed/corpus (unencoded rows can't be
    candidates) — the audit must flag that; after encode_new_vectors
    ingests the missing rows against the FROZEN codebooks, the audit
    must recover above the floor. No retrain anywhere."""
    path = str(tmp_path / "stale_ivfpq")
    evens = emb.where(F.col("vec_id") % 2 == 0)
    odds = emb.where(F.col("vec_id") % 2 == 1)
    idx = ai.build_ann_index(evens, path, "ivfpq", dim=64)
    q = emb.where(F.col("vec_id") < 6)

    stale = ai.index_staleness_audit(
        idx, emb, q, dim=64, k=5, floor_per_1000=600
    ).first()
    # half the corpus is unindexed: recall is capped well below a
    # fresh index's (~absolute ceiling 500 + boundary luck)
    assert not stale.meets_floor
    assert stale.recall_per_1000 <= 600

    ai.encode_new_vectors(idx, odds)
    fresh = ai.index_staleness_audit(
        ai.load_ann_index(path), emb, q, dim=64, k=5, floor_per_1000=450
    ).first()
    assert fresh.meets_floor
    assert fresh.recall_per_1000 > stale.recall_per_1000


def test_compaction_shrinks_files_preserves_codes_and_serving(
    spark, emb, tmp_path
):
    """Append-oriented layouts decay into small files; compact_ann_index
    must cut the file count while keeping every (vec_id, cluster,
    codes) row byte-identical AND the served top-k unchanged."""
    import os

    path = str(tmp_path / "compact_ivfpq")
    base = emb.where(F.col("vec_id") % 4 == 0)
    idx = ai.build_ann_index(base, path, "ivfpq", dim=64)
    for m in (1, 2, 3):  # three ingest batches -> files accrete
        ai.encode_new_vectors(idx, emb.where(F.col("vec_id") % 4 == m))

    def n_files():
        root = os.path.join(path, "codes.parquet")
        return sum(
            1
            for r, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        )

    before_files = n_files()
    before_codes = {
        r.vec_id: (r.cluster, tuple(r.codes))
        for r in idx.codes(spark).collect()
    }
    q = emb.where(F.col("vec_id") < 4)
    before_serve = sorted(
        map(
            tuple,
            sim.cosine_topk_ivfpq(
                emb, q, dim=64, k=5, prebuilt=ai.load_ann_index(path)
            ).collect(),
        )
    )

    after_files = ai.compact_ann_index(ai.load_ann_index(path), spark)
    assert after_files < before_files
    reloaded = ai.load_ann_index(path)
    after_codes = {
        r.vec_id: (r.cluster, tuple(r.codes))
        for r in reloaded.codes(spark).collect()
    }
    assert after_codes == before_codes
    after_serve = sorted(
        map(
            tuple,
            sim.cosine_topk_ivfpq(
                emb, q, dim=64, k=5, prebuilt=reloaded
            ).collect(),
        )
    )
    assert after_serve == before_serve


def test_lifecycle_serves_identically_without_partition_type_inference(
    spark, emb, tmp_path
):
    """Round-9 verdict #5: load_ann_index reads the hive partition
    column (cluster) back through cast('long') — the one conf axis the
    lifecycle tests didn't pin is a session with
    spark.sql.sources.partitionColumnTypeInference.enabled=false,
    where partition values surface as STRINGS. An index written,
    appended to, and compacted under that session must serve
    identically to the default session."""
    conf_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    path = str(tmp_path / "no_inference")
    base = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    q = emb.where(F.col("vec_id") < 4)

    def serve():
        idx = ai.load_ann_index(path)
        df = sim.cosine_topk_ivfpq(emb, q, dim=64, k=5, prebuilt=idx)
        return sorted(map(tuple, df.collect()))

    prior = spark.conf.get(conf_key, "true")
    try:
        # build under the DEFAULT session, serve once for the baseline
        ai.build_ann_index(base, path, "ivfpq", dim=64)
        ai.encode_new_vectors(ai.load_ann_index(path), rest)
        baseline = serve()
        # full lifecycle under the non-default conf: read, append
        # (no-op rows excluded -> re-append a disjoint slice), compact,
        # serve — every stage that touches the partitioned codes table
        spark.conf.set(conf_key, "false")
        no_inf = serve()
        assert no_inf == baseline
        ai.compact_ann_index(ai.load_ann_index(path), spark)
        assert serve() == baseline
    finally:
        spark.conf.set(conf_key, prior)
