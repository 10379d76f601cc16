"""Stateful streaming sessionizer: incremental result == batch result."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ragflow_spark.ops.relational import sessionize
from ragflow_spark.streaming.sessions import latest_session_stats, stream_sessionize


def test_stream_sessionize_matches_batch(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    tmp = tempfile.mkdtemp(prefix="rs_sess_")
    in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    try:
        # split time-ordered: first 60% arrives, then the rest —
        # state must carry across the two availableNow runs
        cutoff = events.approxQuantile("event_id", [0.6], 0.0)[0]
        events.where(F.col("event_id") <= cutoff).write.mode("append").parquet(in_dir)
        q1 = stream_sessionize(spark, in_dir, out_dir, ckpt)
        q1.awaitTermination(120)

        events.where(F.col("event_id") > cutoff).write.mode("append").parquet(in_dir)
        q2 = stream_sessionize(spark, in_dir, out_dir, ckpt)
        q2.awaitTermination(120)

        streamed = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in latest_session_stats(spark, out_dir).collect()
        }
        batch = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in sessionize(events).collect()
        }
        assert streamed == batch
    finally:
        for s in spark.streams.active:
            s.stop()
        shutil.rmtree(tmp, ignore_errors=True)
