"""Watermarked windowed aggregation: the streaming twin of the batch
hourly rollup (ops/relational.py:hourly_rollup).

Plan shape: file/Kafka source -> ``withWatermark(ts, D)`` ->
``groupBy(window(ts, '1 hour'), event_type)`` -> partial-agg shuffle
keyed by (window, event_type) -> append-mode sink.  Append mode emits
each window exactly once, when the watermark passes ``window.end + D``
— so results are final and the parquet sink needs no dedup.  Events
arriving later than D behind the max seen timestamp are DROPPED by the
watermark; the batch query counts them — the equivalence test in
tests/test_streaming_rollup.py pins down both sides of that contract.

Scale notes: state is O(open windows x event types); D bounds it.  The
sum uses the same integer-cents trick as the batch twin so streaming
and batch outputs compare exactly, not approximately.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_hourly_rollup(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = True,
    max_files_per_trigger: int = 8,
):
    """Start the streaming rollup; returns the StreamingQuery."""
    events = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(in_dir)
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("sum_value_e4"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n",
            "sum_value_e4",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
