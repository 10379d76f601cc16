"""spark-submit entry point for the extraction job.

Usage (the north-rule launch shape):

    python scripts/make_pyfiles.py                      # -> dist/ragflow_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/ragflow_spark.zip \
        scripts/spark_job.py \
        --pages <pages parquet/iceberg dir> --out <output dir> \
        [--template naive] [--budget 128] [--buckets 4096] [--no-resume]

On a cluster the zip ships the package to every executor; the job is
the resumable bucket pipeline (ragflow_spark/spark/pipeline.py): url-hash
buckets, per-bucket dynamic-overwrite commits, manifest lineage,
anti-join restart.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser(description="ragflow_spark extraction job")
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--template", default="naive")
    ap.add_argument("--budget", type=int, default=128)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument(
        "--buckets-per-commit", type=int, default=None,
        help="commit granularity (default: PipelineConfig's; larger = "
        "fewer passes, coarser resume points)",
    )
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    # spark-submit provides the session config (master, executors, ...)
    spark = SparkSession.builder.appName("ragflow_spark.extract").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from ragflow_spark.spark.pipeline import PipelineConfig, run_pipeline

    pages = spark.read.parquet(args.pages)
    kw = {}
    if args.buckets_per_commit is not None:
        kw["buckets_per_commit"] = args.buckets_per_commit
    cfg = PipelineConfig(
        out_dir=args.out,
        template=args.template,
        budget=args.budget,
        n_buckets=args.buckets,
        **kw,
    )
    import time

    t0 = time.time()
    totals = run_pipeline(spark, pages, cfg, resume=not args.no_resume)
    # job-internal wall (excludes spark-submit/JVM startup): the
    # throughput figure that scales with executors
    totals["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
