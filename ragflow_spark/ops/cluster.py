"""Embedding-space clustering (Spark ML) — the trained-IVF / RAPTOR
building block.

The reference's RAPTOR recursively clusters chunk embeddings with
UMAP + GaussianMixture before LLM summarization (rag/raptor.py:34-174);
the LLM side is out of scope, but the clustering itself is exactly
Spark ML territory.  The same trained centroids also upgrade the
similarity-search IVF path (ops/simsearch.py) from a fixed centroid
subset to learned cells.

Scale notes: KMeans fit is iterative (J jobs over the corpus) but each
iteration is one map + tree-aggregate; seeded for determinism.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_clusters(
    emb: DataFrame,
    k: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """(assignments (id, cluster), centroids (centroid_id, embedding)).

    Deterministic under a fixed seed + input; centroids come back as
    plain ``array<float>`` so they drop into ``simsearch.knn_ivf``.
    """
    feats = emb.select(
        F.col(id_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    assigned = model.transform(feats).select(
        F.col(id_col), F.col("prediction").alias("cluster")
    )
    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "centroid_id int, embedding array<float>",
    )
    return assigned, centroids


def cluster_sizes(
    emb: DataFrame, k: int = 10, seed: int = 42, **kw
) -> DataFrame:
    assigned, _ = kmeans_clusters(emb, k=k, seed=seed, **kw)
    return (
        assigned.groupBy("cluster")
        .agg(F.count("*").alias("n_members"))
        .select("cluster", "n_members")
    )


def knn_ivf_trained(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 10,
    n_probe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN over *learned* cells: KMeans centroids feed the
    cell-probing search in ops/simsearch.py."""
    from .simsearch import knn_ivf

    _, centroids = kmeans_clusters(
        emb, k=n_cells, seed=seed, id_col=id_col, vec_col=vec_col
    )
    return knn_ivf(
        emb, queries, centroids, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )
