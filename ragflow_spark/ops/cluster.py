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


UMAP_MAX_DRIVER_ROWS = 50_000


def gmm_bic_clusters(
    emb: DataFrame,
    max_cluster: int = 8,
    seed: int = 42,
    threshold: float = 0.1,
    reduce_dim: int = 12,
    restarts: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reducer: str = "pca",
) -> DataFrame:
    """The RAPTOR clustering core (rag/raptor.py:72-155): dimensionality
    reduction, then GaussianMixture with the component count chosen by
    BIC over 1..max_cluster-1, then soft assignment where a row's label
    is the FIRST component whose posterior exceeds ``threshold`` (the
    reference takes ``np.where(prob > thr)[0][0]`` — first index, not
    argmax; quirk preserved, with an argmax guard for the
    all-below-threshold case the reference would crash on).

    ``reducer="umap"`` runs the from-scratch UMAP (``ops/umap.py``)
    with the reference's exact parameterization (rag/raptor.py:138-143)
    — driver-side, as the reference itself does at RAPTOR layer scale;
    above ``UMAP_MAX_DRIVER_ROWS`` it falls back to distributed PCA
    (the deterministic linear reducer, also the ``reducer="pca"``
    default).  The LLM summarize/recurse loop is out of scope per
    SURVEY §2.8; this operator is the per-layer clustering it calls.

    Scale notes: each candidate k fits one Spark ML GMM (iterative
    tree-aggregates); at 10^12 rows you fit on a deterministic sample
    and only the final assignment pass touches the full corpus.
    Returns (id, cluster).
    """
    import math

    from pyspark.ml.clustering import GaussianMixture
    from pyspark.ml.feature import PCA

    n = emb.count()
    if n < 2:
        return emb.select(F.col(id_col), F.lit(0).alias("cluster"))
    dim = len(emb.select(vec_col).first()[0])
    k_red = max(1, min(reduce_dim, dim, n - 2))
    if reducer == "umap" and n <= UMAP_MAX_DRIVER_ROWS and k_red < dim:
        import numpy as np

        from .umap import raptor_reduce

        rows = emb.select(F.col(id_col), F.col(vec_col)).collect()
        ids = [r[0] for r in rows]
        x = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
        red = raptor_reduce(x, seed=seed, n_components_cap=reduce_dim)
        k_red = red.shape[1]
        spark = emb.sparkSession
        feats = spark.createDataFrame(
            [(i, [float(v) for v in row]) for i, row in zip(ids, red)],
            f"{id_col} long, _r array<double>",
        ).select(F.col(id_col), array_to_vector(F.col("_r")).alias("features"))
    else:
        feats = emb.select(
            F.col(id_col), array_to_vector(F.col(vec_col)).alias("features")
        )
        if k_red < dim:
            pca = PCA(k=k_red, inputCol="features", outputCol="reduced").fit(feats)
            feats = pca.transform(feats).select(
                F.col(id_col), F.col("reduced").alias("features")
            )
    feats = feats.cache()
    max_k = min(max_cluster, n)
    d = k_red

    def _bic(ll: float, k: int) -> float:
        n_params = k * d + k * d * (d + 1) // 2 + (k - 1)
        return -2.0 * ll + n_params * math.log(n)

    # k=1: Spark ML needs k >= 2, but the single-Gaussian MLE
    # log-likelihood is closed-form: -n/2 (d ln 2pi + ln det S_mle + d)
    # with S_mle the 1/n covariance — the same optimum sklearn's EM
    # converges to, so the reference's k=1 outcome stays reachable.
    import numpy as np
    from pyspark.ml.stat import Correlation, Summarizer

    stats = feats.select(
        Summarizer.metrics("variance").summary(F.col("features")).alias("s")
    ).first()["s"]
    var = np.array(stats[0])
    corr = Correlation.corr(feats, "features").first()[0].toArray()
    sd = np.sqrt(var)
    cov = corr * np.outer(sd, sd) * ((n - 1) / n)
    sign, logdet = np.linalg.slogdet(cov + 1e-12 * np.eye(d))
    ll1 = -n / 2.0 * (d * math.log(2 * math.pi) + logdet + d)
    best_k, best_bic, best_model = 1, _bic(ll1, 1), None

    # Spark ML's GMM starts from random points (sklearn initializes
    # with k-means), so a single run lands in poor local optima on
    # anisotropic data — a few seeded restarts per k, best LL kept,
    # recovers the reference's behavior.
    for k in range(2, max(max_k, 2)):
        best_ll, best_gm = -float("inf"), None
        for r in range(restarts):
            gm = GaussianMixture(k=k, seed=seed + 101 * r, maxIter=100).fit(feats)
            if gm.summary.logLikelihood > best_ll:
                best_ll, best_gm = gm.summary.logLikelihood, gm
        bic = _bic(best_ll, k)
        if bic < best_bic:
            best_k, best_bic, best_model = k, bic, best_gm
    if best_k == 1 or best_model is None:
        out = feats.select(F.col(id_col), F.lit(0).alias("cluster"))
        feats.unpersist()
        return out
    probs = vector_to_array(F.col("probability"))
    # F.get (0-based) returns NULL on an empty array instead of the
    # ANSI out-of-bounds error element_at would raise
    first_over = F.get(
        F.filter(
            F.transform(
                probs, lambda p, i: F.when(p > threshold, i).otherwise(F.lit(-1))
            ),
            lambda x: x >= 0,
        ),
        F.lit(0),
    )
    argmax = F.array_position(probs, F.array_max(probs)).cast("int") - 1
    out = (
        best_model.transform(feats)
        .select(
            F.col(id_col),
            F.coalesce(first_over, argmax).cast("int").alias("cluster"),
        )
    )
    feats.unpersist()
    return out


def gmm_cluster_sizes(emb: DataFrame, **kw) -> DataFrame:
    return (
        gmm_bic_clusters(emb, **kw)
        .groupBy("cluster")
        .agg(F.count("*").alias("n_members"))
        .select("cluster", "n_members")
    )
