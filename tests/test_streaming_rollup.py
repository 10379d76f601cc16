"""Watermarked windowed rollup: finalized streaming windows == batch
rollup, and late arrivals behind the watermark are dropped (the
watermark contract, both directions)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import functions as F

from ragflow_spark.ops.relational import hourly_rollup
from ragflow_spark.streaming.rollup import stream_hourly_rollup


def _run(spark, in_dir, out_dir, ckpt, **kw):
    q = stream_hourly_rollup(spark, in_dir, out_dir, ckpt, **kw)
    q.awaitTermination(180)


def _rows(df):
    return {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value_e4"])
        for r in df.collect()
    }


def test_stream_rollup_matches_batch(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    tmp = tempfile.mkdtemp(prefix="rs_roll_")
    in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    try:
        events.write.mode("append").parquet(in_dir)
        _run(spark, in_dir, out_dir, ckpt)
        # append-mode only emits windows the watermark has passed; a
        # far-future sentinel event advances it beyond every real
        # window so run 2 flushes them all
        max_ts = events.agg(F.max("ts")).collect()[0][0]
        sentinel_ts = max_ts + dt.timedelta(hours=6)
        spark.createDataFrame(
            [(10_000_000, sentinel_ts, 0, "__sentinel__", 0.0, "{}")],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("append").parquet(in_dir)
        _run(spark, in_dir, out_dir, ckpt)

        streamed = _rows(spark.read.parquet(out_dir))
        batch = _rows(hourly_rollup(events))
        finalized = {
            k: v for k, v in streamed.items() if k[1] != "__sentinel__"
        }
        assert finalized == batch
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def test_late_event_behind_watermark_dropped(spark):
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    tmp = tempfile.mkdtemp(prefix="rs_late_")
    in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    try:
        # batch 1: one event at 00:30, plus one far ahead at 12:00 that
        # drags the watermark (2h) way past hour 0
        spark.createDataFrame(
            [
                (1, t0, 1, "click", 1.0, "{}"),
                (2, t0 + dt.timedelta(hours=12), 1, "click", 1.0, "{}"),
            ],
            schema,
        ).write.mode("append").parquet(in_dir)
        _run(spark, in_dir, out_dir, ckpt)
        # batch 2: a LATE event back in hour 0 (already finalized) and a
        # sentinel far ahead to flush everything still open
        spark.createDataFrame(
            [
                (3, t0 + dt.timedelta(minutes=5), 1, "click", 1.0, "{}"),
                (4, t0 + dt.timedelta(hours=24), 1, "flush", 0.0, "{}"),
            ],
            schema,
        ).write.mode("append").parquet(in_dir)
        _run(spark, in_dir, out_dir, ckpt)

        got = _rows(spark.read.parquet(out_dir))
        hour0 = dt.datetime(2024, 1, 1, 0, 0)
        # the late event (id 3) must NOT be counted: hour-0 window was
        # finalized with exactly one event
        assert got[(hour0, "click")][0] == 1
        # while a batch query over the same files counts both
        batch = _rows(hourly_rollup(spark.read.parquet(in_dir)))
        assert batch[(hour0, "click")][0] == 2
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)
