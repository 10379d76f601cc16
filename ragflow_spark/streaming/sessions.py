"""Custom stateful streaming operator: incremental sessionization.

``applyInPandasWithState`` keeps per-user state (event count, session
count, last event second) across micro-batches and restarts (state
lives in the streaming checkpoint).  The session rule is identical to
the batch operator (ops/relational.py:sessionize): a new session starts
when the gap from the previous event exceeds ``gap_sec`` strictly —
so an incremental run over a growing directory must converge to the
batch answer over the full input, which is exactly what the test
asserts.

Scale notes: state is shuffled by ``user_id`` once per micro-batch;
state size is O(active users) x 24 bytes.  Output mode is ``update``
(one row per user per batch with the running totals); the sink is
``foreachBatch`` -> parquet append, so downstream readers take the
row with the max ``batch_id`` per user.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

OUTPUT_SCHEMA = "user_id long, n_events long, n_sessions long, last_sec long"
STATE_SCHEMA = "n_events long, n_sessions long, last_sec long"


def make_session_updater(gap_sec: int = 1800):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n_events, n_sessions, last_sec = state.get
        else:
            n_events, n_sessions, last_sec = 0, 0, None
        # concatenate the group's Arrow chunks BEFORE sorting: a user
        # whose batch spans several chunks (>10k events, or multiple
        # input files) arrives as multiple pdfs in arbitrary order —
        # sorting each chunk alone walks gaps out of time order, so
        # session counts depended on shuffle chunking and diverged
        # from the batch sessionize this operator must converge to
        parts = list(pdfs)
        if not parts:
            # a group can fire with zero chunks under a timeout conf
            # (NoTimeout today, but the guard costs one branch):
            # re-emit the running totals without touching state math
            state.update((n_events, n_sessions, last_sec))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n_events],
                    "n_sessions": [n_sessions],
                    "last_sec": [last_sec],
                }
            )
            return
        batch = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        for _, r in batch.sort_values(["ts", "event_id"]).iterrows():
            sec = int(r["ts"].timestamp())
            if last_sec is None or sec - last_sec > gap_sec:
                n_sessions += 1
            last_sec = sec
            n_events += 1
        state.update((n_events, n_sessions, last_sec))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n_events],
                "n_sessions": [n_sessions],
                "last_sec": [last_sec],
            }
        )

    return update


def stream_sessionize(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_sec: int = 1800,
    available_now: bool = True,
):
    """Start the incremental sessionizer over an event-file stream;
    returns the StreamingQuery."""
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
    updated = events.groupBy("user_id").applyInPandasWithState(
        make_session_updater(gap_sec),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: Any, batch_id: int) -> None:
        batch_df.withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(out_dir)

    writer = updated.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    ).outputMode("update")
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def latest_session_stats(spark: SparkSession, out_dir: str):
    """Collapse the update log to the newest row per user."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(out_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("batch_id"), F.desc("n_events")
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .select("user_id", "n_sessions", "n_events")
    )
