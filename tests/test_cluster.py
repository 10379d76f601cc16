"""Spark ML clustering ops: determinism + IVF integration."""

from __future__ import annotations

from pyspark.sql import functions as F

from ragflow_spark.ops.cluster import cluster_sizes, kmeans_clusters, knn_ivf_trained


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_kmeans_deterministic(spark):
    emb = _emb(spark)
    a1, c1 = kmeans_clusters(emb, k=5, seed=42)
    a2, c2 = kmeans_clusters(emb, k=5, seed=42)
    assert {tuple(r) for r in a1.collect()} == {tuple(r) for r in a2.collect()}
    assert c1.count() == 5
    sizes = cluster_sizes(emb, k=5, seed=42)
    assert sizes.agg(F.sum("n_members")).collect()[0][0] == emb.count()


def test_knn_ivf_trained_shape(spark):
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = knn_ivf_trained(emb, q, k=3, n_cells=5)
    rows = top.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
    assert all(r["neighbor_id"] != r["query_id"] for r in rows)


def test_embedding_near_dup_exact_and_lsh(spark):
    """LSH near-dup pairs must be a subset of the exact pairs with the
    same rounded cosine; exact must agree pairwise-symmetric."""
    from ragflow_spark.ops.dedup import (
        embedding_near_dup_lsh,
        embedding_near_dup_pairs,
    )

    emb = _emb(spark)
    exact = embedding_near_dup_pairs(emb, threshold=0.30)
    lsh = embedding_near_dup_lsh(emb, threshold=0.30, n_bits=12, n_bands=6)
    e = {(r.id_a, r.id_b): r.sim for r in exact.collect()}
    l = {(r.id_a, r.id_b): r.sim for r in lsh.collect()}
    assert e, "threshold too high: no exact pairs in fixture"
    assert set(l) <= set(e)
    for k, v in l.items():
        assert abs(e[k] - v) < 1e-9
    # ordering invariant: id_a < id_b everywhere
    assert all(a < b for a, b in e)
    # generous banding (6 bands x 2 bits) should recall most pairs
    assert len(l) >= len(e) * 0.5
