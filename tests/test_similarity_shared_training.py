"""Shared coarse-training contract (r12 optimization, guide §2.4).

The ANN evaluation queries train the seeded coarse k-means ONCE and
inject it into both the ivf and ivfpq variants. That is only sound
because training is deterministic: identical (corpus, dim, n_centroids,
iters, seed, train_fraction) must yield bit-identical centroids, and
injecting them must yield bit-identical query results vs the
train-inside path. These tests pin both halves.
"""

from __future__ import annotations

import numpy as np
import pytest

from clickhouse_only_importer_prototype_spark.operators import similarity


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_retraining_is_bit_identical(embeddings):
    a = similarity.ivf_train_centroids(
        embeddings, dim=64, n_centroids=16, iters=2
    )
    b = similarity.ivf_train_centroids(
        embeddings, dim=64, n_centroids=16, iters=2
    )
    assert a.shape == (16, 64)
    assert np.array_equal(a, b)  # bit-exact, not allclose


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_injected_cents_match_ivf_default_path(embeddings):
    q = embeddings.where("vec_id < 6")
    cents = similarity.ivf_train_centroids(
        embeddings, dim=64, n_centroids=16, iters=2
    )
    base = similarity.cosine_topk_ivf(
        embeddings, q, dim=64, k=5, n_centroids=16, nprobe=4
    )
    shared = similarity.cosine_topk_ivf(
        embeddings, q, dim=64, k=5, n_centroids=16, nprobe=4, cents=cents
    )
    assert _rows(base) == _rows(shared)


def test_injected_cents_match_ivfpq_default_path(embeddings):
    q = embeddings.where("vec_id < 6")
    cents = similarity.ivf_train_centroids(
        embeddings, dim=64, n_centroids=16, iters=2
    )
    base = similarity.cosine_topk_ivfpq(embeddings, q, dim=64, k=5)
    shared = similarity.cosine_topk_ivfpq(
        embeddings, q, dim=64, k=5, cents=cents
    )
    assert _rows(base) == _rows(shared)


def test_n_rows_hint_is_bit_identical(embeddings):
    """The footer row-count hint must be a pure job-elision: same
    sliver, same centroids/codebooks, bit-for-bit."""
    n = embeddings.count()
    a = similarity.ivf_train_centroids(
        embeddings, dim=64, n_centroids=16, iters=2
    )
    b = similarity.ivf_train_centroids(
        embeddings, dim=64, n_centroids=16, iters=2, n_rows=n
    )
    assert np.array_equal(a, b)
    ca = similarity.pq_train_codebooks(
        embeddings, dim=64, m=8, n_codes=16, iters=2
    )
    cb = similarity.pq_train_codebooks(
        embeddings, dim=64, m=8, n_codes=16, iters=2, n_rows=n
    )
    assert np.array_equal(ca, cb)


def test_prebuilt_takes_precedence_over_cents(embeddings, tmp_path):
    """prebuilt wins: cents is only consulted on the in-session path."""
    from clickhouse_only_importer_prototype_spark.operators import ann_index

    q = embeddings.where("vec_id < 3")
    path = str(tmp_path / "ivf_idx")
    ann_index.build_ann_index(embeddings, path, "ivf", dim=64)
    idx = ann_index.load_ann_index(path)
    # deliberately WRONG cents: must be ignored when prebuilt is given
    wrong = np.zeros((16, 64), dtype=np.float64)
    wrong[:, 0] = 1.0
    served = similarity.cosine_topk_ivf(
        embeddings, q, dim=64, k=5, prebuilt=idx, cents=wrong
    )
    base = similarity.cosine_topk_ivf(embeddings, q, dim=64, k=5)
    assert _rows(served) == _rows(base)
