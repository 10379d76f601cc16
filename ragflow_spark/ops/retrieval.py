"""Retrieval-side operators (reference §2.9) at corpus scale.

The reference delegates scoring to Elasticsearch/Infinity (weighted
full-text + dense fusion, rag/nlp/search.py:48-133); here the same
semantics are native DataFrame plans:

* **BM25** — inverted stats via two aggregations (df/idf, doc length),
  scoring via a broadcast join of the query terms against the flat
  (doc, term, tf) postings.  Shuffles: one per aggregation, keyed by
  term/doc — partial aggregation keeps shuffle volume at O(distinct
  terms) and O(docs).  Lucene-style idf: ln(1 + (N - df + .5)/(df + .5)).
* **Hybrid fusion** — 0.05 * normalized-BM25 + 0.95 * cosine
  (fusion weights parity: rag/nlp/search.py:114), with the dense side
  from the deterministic hash encoder (ops/embed.py).

Terms here are whitespace tokens of the canonical text so an external
SQL oracle reproduces scores exactly; the tokenizer-backed variant
(content_tokens) plugs in by swapping the term column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import norm_text

K1, B = 1.2, 0.75


def term_postings(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Flat postings (id, term, tf) + per-doc length ``dl``."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(norm_text(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    return toks.groupBy("id", "term").agg(F.count("*").alias("tf"))


def doc_lengths(postings: DataFrame) -> DataFrame:
    return postings.groupBy("id").agg(F.sum("tf").alias("dl"))


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    top_k: int = 20,
) -> DataFrame:
    """Top-k docs for a bag-of-terms query: (doc_id, score, rank).

    Deterministic across engines: per-term partial scores are summed
    after an ORDER-insensitive aggregate, then rounded; ranking ties
    break on doc id.
    """
    postings = term_postings(df, id_col, text_col)
    dls = doc_lengths(postings)
    n_docs = df.select(F.count("*").alias("n")).collect()[0]["n"]
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))
    spark = df.sparkSession
    qt = spark.createDataFrame([(t,) for t in query_terms], "term string").distinct()

    # avgdl computed once (exact: integer sum / count); the scoring
    # expression below mirrors the oracle SQL operation-for-operation
    avgdl = dls.select(F.avg("dl").alias("a")).collect()[0]["a"]
    scored = (
        postings.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfreq.join(F.broadcast(qt), "term")), "term")
        .join(dls, "id")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "partial",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
            ),
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.groupBy("id")
        .agg(F.round(F.sum("partial"), 4).alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_k)
        .select(F.col("id").alias(id_col), "score", "rank")
    )


def hybrid_rerank(
    df: DataFrame,
    query_text: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    text_weight: float = 0.05,
    dense_weight: float = 0.95,
    top_k: int = 10,
    dim: int = 32,
) -> DataFrame:
    """Weighted text+dense fusion (0.05/0.95 parity): BM25 normalized by
    the per-query max, dense side = cosine vs the hash-encoded query."""
    from .embed import _HashEncoder, embed_chunks
    from .simsearch import as_double, cosine

    terms = [t for t in query_text.lower().split() if t]
    bm = bm25_scores(df, terms, id_col, text_col, top_k=1_000_000)
    max_score = bm.select(F.max("score").alias("m")).collect()
    m = max_score[0]["m"] if max_score and max_score[0]["m"] else 1.0

    chunks = df.select(
        F.col(id_col).alias("chunk_id"), F.col(text_col).alias("content")
    )
    emb = embed_chunks(chunks, dim=dim).withColumnRenamed("chunk_id", id_col)
    qv = _HashEncoder(dim).encode([query_text])[0]
    spark = df.sparkSession
    qdf = spark.createDataFrame([(qv,)], f"qv array<float>")

    fused = (
        emb.crossJoin(F.broadcast(qdf))
        .join(bm.select(id_col, "score"), id_col, "left")
        .withColumn(
            "dense_sim", F.round(cosine(as_double(F.col("q_vec")), as_double(F.col("qv"))), 6)
        )
        .withColumn(
            "fused",
            F.round(
                F.lit(text_weight) * F.coalesce(F.col("score") / F.lit(float(m)), F.lit(0.0))
                + F.lit(dense_weight) * F.col("dense_sim"),
                6,
            ),
        )
    )
    w = Window.orderBy(F.desc("fused"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_k)
        .select(id_col, "fused", "dense_sim", "rank")
    )
