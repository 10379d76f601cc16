"""Physical-plan shape assertions — the scale properties the engine
relies on at 100 TB, locked in as tests:

* extraction is map-only (zero shuffles between scan and write),
* parquet scans are column-pruned and filter-pushed,
* small sides of joins are broadcast (no sort-merge join sneaks in),
* aggregations are partial (map-side combine) before the shuffle.

A regression here usually means a silent 10-100x slowdown at scale even
though sf0.01 results stay correct.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def pages_pq(spark, tmp_path_factory):
    from ragflow_spark.data.pagegen import pages_dataframe

    path = str(tmp_path_factory.mktemp("plans") / "pages")
    pages_dataframe(spark, 60, partitions=4).write.parquet(path)
    return path


def test_extract_pipeline_is_map_only(spark, pages_pq):
    """Scan -> filter -> mapInPandas -> project: no Exchange anywhere.
    The only shuffle in the whole job is the bucketed *write*."""
    from ragflow_spark.spark.pipeline import PipelineConfig, transform_chunks

    pages = spark.read.parquet(pages_pq)
    chunks = transform_chunks(pages, PipelineConfig(out_dir="/tmp/unused"))
    p = plan_str(chunks)
    assert "Exchange" not in p, p
    assert "MapInPandas" in p or "ArrowEvalPython" in p or "mapInPandas" in p


def test_extract_scan_prunes_columns(spark, pages_pq):
    """transform_extracted must not read warc_ts: ReadSchema is the
    4-column projection, not the full 5-column table."""
    from ragflow_spark.spark.pipeline import transform_extracted

    pages = spark.read.parquet(pages_pq)
    p = plan_str(transform_extracted(pages))
    assert "warc_ts" not in p, p
    for col in ("url", "html", "lang"):
        assert col in p


def test_filter_pushdown_reaches_scan(spark, pages_pq):
    pages = spark.read.parquet(pages_pq)
    q = pages.where(F.col("lang") == "English").select("url")
    p = plan_str(q)
    assert "PushedFilters: [" in p
    assert "lang" in p.split("PushedFilters", 1)[1][:120], p


def test_knn_bruteforce_broadcasts_queries(spark):
    from ragflow_spark.ops.simsearch import knn_bruteforce

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    p = plan_str(knn_bruteforce(emb, qs, k=3))
    assert "Broadcast" in p, p
    assert "SortMergeJoin" not in p, p


def test_knn_bruteforce_two_phase_topk(spark):
    """The scored corpus x queries set must be reduced to local top-k
    (MapInPandas) BEFORE any shuffle: the only Exchange sits between
    the window resolve and the local reduction, never below it.  The
    r2 plan shuffled the entire scored corpus into one task per query."""
    from ragflow_spark.ops.simsearch import knn_bruteforce

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    p = plan_str(knn_bruteforce(emb, qs, k=3), mode="simple")
    i_win = p.find("Window")
    i_map = p.find("MapInPandas")
    assert i_win != -1 and i_map != -1, p
    # plan prints top-down: resolve window above the local reduction
    assert i_win < i_map, p
    # no shuffle below the local reduction: the scored set is never
    # exchanged (the broadcast of the tiny query side is fine)
    assert "Exchange hashpartitioning" not in p[i_map:], p


def test_ivf_assign_partial_window_limit(spark):
    """ivf_assign's argmax window must plan a WindowGroupLimit Partial
    BELOW its Exchange: each map partition reduces corpus x centroids
    to 1 row per vector before the shuffle, so the exchange moves
    O(corpus) rows, not O(corpus x centroids).  A Spark downgrade or a
    plan rewrite that loses this turns the assignment into a
    corpus x centroids shuffle at 10^12 rows."""
    from ragflow_spark.ops.simsearch import ivf_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.limit(8).select(F.col("vec_id").alias("centroid_id"), "embedding")
    p = plan_str(ivf_assign(emb, cents), mode="simple")
    i_ex = p.find("Exchange hashpartitioning")
    i_partial = p.find("WindowGroupLimit", i_ex)
    assert i_ex != -1 and i_partial != -1, p
    assert "Partial" in p[i_partial : i_partial + 200], p


def test_bm25_no_sort_merge_join(spark):
    from ragflow_spark.ops.retrieval import bm25_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = plan_str(bm25_scores(docs, ["engine", "data"], top_k=5))
    assert "SortMergeJoin" not in p, p
    assert "Broadcast" in p, p


def test_bm25_query_filter_below_postings_aggregation(spark):
    """The broadcast query-term semi-filter must land BELOW the (id,
    term) tf aggregation: every wide exchange then carries only the
    query-matched postings — O(docs containing a query term) — never
    the full O(all postings) relation.  Checked structurally: no
    Exchange hashpartitioning in the plan sits below the scan without
    the BroadcastHashJoin on term under it."""
    import re

    from ragflow_spark.ops.retrieval import bm25_raw_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = plan_str(bm25_raw_scores(docs, ["engine", "data"]), mode="simple")
    # (a) the tf exchange is keyed (id, term, dl): dl riding the
    # exchange keys proves per-doc length comes from the scan, not a
    # corpus-wide groupBy(id) + join (the pre-r5 shape had no dl key).
    m = re.search(r"Exchange hashpartitioning\(id#\d+L?, term#\d+, dl#\d+", p)
    assert m, p
    # (b) below that exchange (later in the text), the broadcast term
    # join appears before any further wide exchange — the semi-filter
    # runs on the exploded rows BEFORE they shuffle.
    rest = p[m.end() :]
    i_bj = rest.find("BroadcastHashJoin")
    i_ex = rest.find("Exchange hashpartitioning")
    assert i_bj != -1 and (i_ex == -1 or i_bj < i_ex), p


def test_dedup_exact_partial_aggregation(spark):
    """groupBy must plan as partial HashAggregate -> Exchange -> final
    HashAggregate (map-side combine shrinks the shuffle)."""
    from ragflow_spark.ops.dedup import dedup_exact

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = plan_str(dedup_exact(docs), mode="simple")
    first = p.find("HashAggregate")
    ex = p.find("Exchange", first)
    second = p.find("HashAggregate", ex)
    assert first != -1 and ex != -1 and second != -1, p
    # the shuffle key is the 64-hex sha256 of the canonical text, not
    # the text itself — a mostly-unique 10^12-row corpus would
    # otherwise push its full bytes through the exchange (r4)
    assert "sha2" in p, p
    assert "_k" in p[ex:], p


def test_minhash_signature_stage_is_mapside(spark):
    """r4 rewrite: minhash signatures come from one map-side projection
    (per-element xxhash64 + affine window folds + a single-pass
    aggregate/zip_with/least array accumulator) — no shuffle-feeding
    aggregate.  The only HashAggregates left in the candidate plan are
    the final distinct's partial/final pair; the earlier
    explode + groupBy-min shape had four, and the intermediate
    32-array_min-columns shape paid 32 traversals + a codegen unit
    that grew with K (docs/PLANS.md, codegen-size cliff)."""
    from ragflow_spark.ops.dedup import minhash_lsh_candidates

    docs = spark.createDataFrame(
        [(i, f"w{i} common words shared by docs {i}") for i in range(20)],
        "doc_id long, text string",
    )
    p = plan_str(minhash_lsh_candidates(docs, shingle="word"), mode="simple")
    assert p.count("HashAggregate") == 2, p
    # single-pass signature: a higher-order aggregate folding least()
    # inside zip_with, not K unrolled array_min columns
    assert "least(" in p and "zip_with" in p, p
    assert "array_min" not in p, p


def test_simhash_signature_stays_codegen_compact(spark):
    """r4 codegen-size cliff guard: the simhash signature must stay a
    SINGLE higher-order aggregate with an array accumulator.  The
    64-way unrolled per-bit form compiled to an expression tree big
    enough to fall out of whole-stage codegen into interpreted
    evaluation (8-9x slower; docs/PLANS.md).  The plan should carry
    exactly two `aggregate(` lambdas per signature reference (the
    count pass and the pack fold), not 64."""
    from ragflow_spark.ops.dedup import simhash_pairs

    docs = spark.createDataFrame(
        [(i, f"shared tokens for doc {i}") for i in range(10)],
        "doc_id long, text string",
    )
    p = plan_str(simhash_pairs(docs, max_hamming=3), mode="simple")
    # Each signature reference carries 2 nested aggregates (count pass
    # + pack fold); the self-join has two sides -> 4 total.  The
    # unrolled form would show 64+ per reference.
    n_aggs = p.count("aggregate(")
    assert 2 <= n_aggs <= 8, (n_aggs, p[:2000])
    assert "zip_with" in p, p[:2000]
    # the explicit null pre-filter + non-nullable coalesce keep
    # Catalyst from pushing an isnotnull(key) check below the
    # projections — that pushdown re-evaluated the ENTIRE signature
    # aggregate per row per side (r4 finding, docs/PLANS.md)
    filter_aggs = sum(
        line.count("aggregate(") for line in p.splitlines() if "Filter" in line
    )
    assert filter_aggs == 0, p[:2000]
    # hamming filter sits with the join, before the distinct's aggregate
    assert "bit_count" in p, p[:2000]


def test_minhash_dedup_catches_identical_and_empty_docs(spark):
    """Window-hash shingles must keep the string-shingle edge
    behavior: duplicate docs pair (jaccard 1.0) even when shorter than
    the window; empty docs pair with each other; distinct prose does
    not pair."""
    from ragflow_spark.ops.dedup import minhash_dedup_pairs

    rows = [
        (1, "tiny"),
        (2, "tiny"),
        (3, ""),
        (4, ""),
        (5, "completely different longer prose about something else"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_dedup_pairs(docs, threshold=0.8).collect()
    }
    assert set(got) == {(1, 2), (3, 4)}
    assert got[(1, 2)] == 1.0 and got[(3, 4)] == 1.0


def test_near_dup_lsh_single_pair_shuffle(spark):
    """The LSH near-dup join shuffles on (band, bkey) only — no
    quadratic nested-loop join in the plan."""
    from ragflow_spark.ops.dedup import embedding_near_dup_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    p = plan_str(embedding_near_dup_lsh(emb, threshold=0.3))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_topk_plans_use_take_ordered(spark):
    """Top-k ranking must compile to TakeOrderedAndProject (distributed
    per-partition heaps), never a bare row_number() over an
    unpartitioned window that funnels the full relation into one task."""
    from ragflow_spark.ops.relational import top_users
    from ragflow_spark.ops.retrieval import bm25_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for q in (
        bm25_scores(docs, ["engine", "data"], top_k=5),
        top_users(events, k=10),
    ):
        p = plan_str(q, mode="simple")
        assert "TakeOrderedAndProject" in p, p


def test_bm25_single_job_no_driver_collects(spark):
    """Corpus stats (N, avgdl) are broadcast 1-row aggregates inside
    the plan; building the DataFrame must launch zero Spark jobs."""
    from ragflow_spark.ops.retrieval import bm25_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = bm25_scores(docs, ["engine", "data"], top_k=5)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "plan construction launched a Spark job"
    assert df.count() >= 0


def test_hybrid_rerank_take_ordered(spark):
    from ragflow_spark.ops.retrieval import hybrid_rerank

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = plan_str(hybrid_rerank(docs, "engine data", top_k=5), mode="simple")
    assert "TakeOrderedAndProject" in p, p


def test_knn_join_conditions_carry_no_dot_products(spark):
    """The nullability-pushdown corollary for k-NN (docs/PLANS.md): a
    where(sim.isNotNull()) above a scoring join gets substituted into
    the JOIN CONDITION, re-evaluating the whole dot product per
    candidate pair.  The fix — degenerate vectors filtered per side
    below the join, norms carried as columns — must keep every join
    condition free of array aggregates."""
    import re

    from ragflow_spark.ops.dedup import embedding_near_dup_lsh
    from ragflow_spark.ops.simsearch import (
        knn_bruteforce,
        knn_ivf,
        knn_lsh,
        knn_lsh_md5,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    for name, df in {
        "knn_bruteforce": knn_bruteforce(emb, q, k=5),
        "knn_ivf": knn_ivf(emb, q, cent, k=5, n_probe=3),
        "knn_lsh": knn_lsh(emb, q, k=5),
        "knn_lsh_md5": knn_lsh_md5(emb, q, k=5),
        "near_dup_lsh": embedding_near_dup_lsh(emb),
    }.items():
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        joins = re.findall(r"Join [A-Za-z]+, \(.*", plan)
        dots = sum(j.count("aggregate(") for j in joins)
        assert dots == 0, f"{name}: dot product in join condition\n" + "\n".join(joins)
