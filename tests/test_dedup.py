"""Dedup operator tests: exact, n-gram Jaccard, MinHash-LSH, SimHash."""

from __future__ import annotations

import pytest

from clickhouse_only_importer_prototype_spark.operators import dedup


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Small corpus with known duplicate structure."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    near = "the quick brown fox jumps over the lazy dog near the river shore"
    far = "completely different text about spark query engines and columnar data"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, "The  Quick brown fox jumps over the lazy dog near the river bank"),
        # normalized-exact dup of 0 (case+whitespace)
        (3, near),  # near dup of 0
        (4, far),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_groups(spark, dup_docs):
    groups = {r.keeper_doc_id: r.dup_count for r in dedup.exact_duplicates(dup_docs).collect()}
    assert groups[0] == 3  # docs 0,1,2 share normalized text
    assert groups[3] == 1
    assert sum(groups.values()) == 6


def test_exact_dedup_keeps_min_id(spark, dup_docs):
    kept = sorted(r.doc_id for r in dedup.exact_dedup(dup_docs).collect())
    assert kept == [0, 3, 4, 5]


def test_ngram_jaccard_finds_near_dup(spark, dup_docs):
    pairs = dedup.ngram_jaccard_pairs(dup_docs, n=3, threshold=0.5).collect()
    by_pair = {(r.doc_a, r.doc_b): r.jaccard_per_1000 for r in pairs}
    # exact dups share all shingles
    assert by_pair[(0, 1)] == 1000
    assert by_pair[(0, 2)] == 1000
    # near dup: 13 tokens -> 11 shingles, only the final shingle differs
    assert (0, 3) in by_pair
    assert 500 <= by_pair[(0, 3)] < 1000
    # unrelated docs absent
    assert not any(4 in p for p in by_pair)


def test_jaccard_per1000_value(spark, dup_docs):
    pairs = dedup.ngram_jaccard_pairs(dup_docs, n=3, threshold=0.1).collect()
    row = next(r for r in pairs if (r.doc_a, r.doc_b) == (0, 3))
    # sets of 11 shingles each, 10 shared -> J = 10/12 = 0.8333 -> 833
    assert row.inter_size == 10
    assert row.size_a == 11 and row.size_b == 11
    assert row.jaccard_per_1000 == 833


def test_minhash_signature_shape_and_determinism(spark, dup_docs):
    sig = dedup.minhash_signatures(dup_docs, num_hashes=16)
    rows = {r.doc_id: r.signature for r in sig.collect()}
    assert all(len(s) == 16 for s in rows.values())
    assert rows[0] == rows[1]  # identical docs -> identical signatures
    rows2 = {r.doc_id: r.signature for r in sig.collect()}
    assert rows == rows2


def test_minhash_lsh_recovers_near_dups(spark, dup_docs):
    pairs = dedup.minhash_dedup_pairs(
        dup_docs, num_hashes=32, bands=16, threshold=0.5
    ).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 1) in found and (0, 2) in found and (1, 2) in found
    assert (0, 3) in found  # J=0.66 caught with 16 bands of 2


def test_simhash_deterministic_and_near(spark, dup_docs):
    sigs = {r.doc_id: r.simhash for r in dedup.simhash(dup_docs).collect()}
    assert sigs[0] == sigs[1]
    ham = bin(sigs[0] ^ sigs[3]).count("1")
    far = bin(sigs[0] ^ sigs[4]).count("1")
    assert ham < far  # near-dup closer in hamming space than unrelated


def test_simhash_neardup_pairs(spark, dup_docs):
    pairs = dedup.simhash_neardup_pairs(dup_docs, max_hamming=8).collect()
    found = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert found[(0, 1)] == 0
    assert (0, 4) not in found


def test_dedup_stats(spark, dup_docs):
    row = dedup.dedup_stats(dup_docs).collect()[0]
    assert row.total_docs == 6
    assert row.distinct_texts == 4
    assert row.dup_groups == 1


def test_neardup_clusters_components(spark):
    from clickhouse_only_importer_prototype_spark.operators.dedup import (
        neardup_clusters,
    )

    # components: {1,2,3,4} (chain), {10,11}, singleton 20 not in edges
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (4, 1)],
        "doc_a long, doc_b long",
    )
    got = {r.doc_id: r.cluster_id for r in neardup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_neardup_clusters_long_chain(spark):
    from clickhouse_only_importer_prototype_spark.operators.dedup import (
        neardup_clusters,
    )

    # a 12-node path exercises multi-round propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in neardup_clusters(pairs).collect()}
    assert got == {i: 0 for i in range(12)}


def test_minhash_dedup_clusters_equals_expanded_graph(spark, sf_dir):
    from clickhouse_only_importer_prototype_spark.operators.dedup import (
        minhash_dedup_clusters,
        minhash_dedup_pairs,
        neardup_clusters,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fast = {
        (r.doc_id, r.cluster_id)
        for r in minhash_dedup_clusters(
            docs, num_hashes=32, bands=16, threshold=0.8
        ).collect()
    }
    pairs = minhash_dedup_pairs(docs, num_hashes=32, bands=16, threshold=0.8)
    naive = {
        (r.doc_id, r.cluster_id) for r in neardup_clusters(pairs).collect()
    }
    assert fast == naive
