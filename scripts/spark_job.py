"""spark-submit entry point for the extraction job.

Usage (the north-rule launch shape):

    python scripts/make_pyfiles.py                      # -> dist/ragflow_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/ragflow_spark.zip \
        scripts/spark_job.py \
        --pages <pages parquet/iceberg dir> --out <output dir> \
        [--template naive] [--budget 128] [--buckets 4096] \
        [--buckets-per-commit N] [--max-commit-groups N] [--no-resume]

On a cluster the zip ships the package to every executor; the job is
the resumable bucket pipeline (ragflow_spark/spark/pipeline.py): url-hash
buckets, per-bucket dynamic-overwrite commits, manifest lineage,
anti-join restart.  All argument parsing and run logic live in
ragflow_spark.spark.pipeline.cli() — this file only supplies the
spark-submit-provided session.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def main() -> None:
    # spark-submit provides the session config (master, executors, ...)
    spark = SparkSession.builder.appName("ragflow_spark.extract").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from ragflow_spark.spark.pipeline import cli

    cli(spark=spark)


if __name__ == "__main__":
    main()
