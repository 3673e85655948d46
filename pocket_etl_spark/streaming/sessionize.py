"""Custom stateful streaming operator: gap-based sessionization.

The reference has NO stateful operators (SURVEY.md §2.6 — order-independence +
keyed merge is its answer to time). This module supplies the missing category
the Spark-first way, in both execution modes:

- ``sessionize_batch``: the declarative form — lag() gap detection + running
  session counter + per-session aggregate. Two window passes over ONE key
  shuffle (both windows share the partitioning), then a hash aggregate. This is
  the replay/backfill path and the DuckDB-checkable oracle twin
  (queries.py q_sessionize).
- ``sessionize_stream``: ``applyInPandasWithState`` with per-key session state
  and an event-gap timeout — the live path. State per key is O(1) (current
  session bounds + count), emitted when the gap closes it; processing-time
  timeout flushes idle keys. Arrow-batched per group, never per-row Python.

At 100 TB the batch form is one shuffle; the streaming form's state store is
partitioned by key (RocksDB-backed on a cluster) and scales with executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),  # epoch sec
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_sec: int = 1800,
) -> DataFrame:
    """Batch sessionization: one key shuffle, two stacked windows, one aggregate."""
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    is_new = F.when(
        (epoch - F.lag(epoch).over(w) > gap_sec) | F.lag(epoch).over(w).isNull(), 1
    ).otherwise(0)
    cum = Window.partitionBy(key_col).orderBy(ts_col, order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        df.withColumn("_epoch", epoch)
        .withColumn("_new", is_new)
        .withColumn("session_id", F.sum("_new").over(cum))
        .groupBy(key_col, "session_id")
        .agg(
            F.min("_epoch").alias("session_start"),
            F.max("_epoch").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    idle_flush_ms: int = 30000,
) -> DataFrame:
    """Streaming sessionization over ``applyInPandasWithState``.

    Expects a streaming DataFrame with (user_id: long, ts: timestamp). Emits a
    row per CLOSED session; idle keys flush via processing-time timeout. Late
    rows inside the gap extend the open session; rows older than the open
    session's start are folded in (min/max bounds) — deterministic for replay.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start": [start], "session_end": [end], "n_events": [n]}
            )
            return

        times: list[int] = []
        for pdf in pdfs:
            times.extend(int(t.timestamp()) for t in pdf["ts"])
        times.sort()
        start, end, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in times:
            if start is None:
                start, end, n = t, t, 1
            elif t - end > gap_sec:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                start, end, n = min(start, t), max(end, t), n + 1
        state.update((start, end, n))
        state.setTimeoutDuration(idle_flush_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
