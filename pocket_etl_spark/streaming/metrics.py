"""Ingest metrics: a per-batch metrics table for the CDC tail.

The reference emits a hierarchical metrics tree per run — per-stage timers and
``recordsProcessed`` counters rolled child→parent on close
(EtlMetrics.java:25-53, EtlProfilingScope.java:47-128,
MetricsEmissionEtlConsumer.java:44-61). The streaming engine's counterpart is a
durable, queryable metrics TABLE fed from two sides:

- ``IngestMetricsListener`` — a StreamingQueryListener capturing Spark's own
  per-batch progress (input rows, batch duration, rows/sec) the moment each
  micro-batch completes;
- ``ApplyResult`` fields written by the apply stage itself (rows_in, rows_bad,
  distinct keys, hot keys, merge version) — recorded in the lineage documents
  (cdc/apply.py) keyed by the same batch_id.

Both are append-only JSON-lines under ``<table>/_metrics`` so operators can
``spark.read.json`` them next to the data — no external metrics system needed
for the hermetic deployment, and the listener shape drops straight onto a real
sink (CloudWatch/Prometheus) on a cluster.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

METRICS_DIR = "_metrics"


class IngestMetricsListener(StreamingQueryListener):
    """Append one JSON line per completed micro-batch of the named query.

    Note: ``num_input_rows`` is Spark's count of rows READ from the source in
    the trigger — the apply body scans each batch more than once (stats pass +
    merge), so it over-counts logical events; exact per-batch event counts
    live in the lineage documents (cdc/apply.py), keyed by the same batch_id."""

    def __init__(self, table_path: str, query_name: str | None = None) -> None:
        self.dir = os.path.join(table_path, METRICS_DIR)
        os.makedirs(self.dir, exist_ok=True)
        self.query_name = query_name
        self._file = os.path.join(self.dir, f"progress_{uuid.uuid4().hex[:8]}.jsonl")

    def onQueryStarted(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        if self.query_name is not None and p.name != self.query_name:
            return
        row = {
            "query_id": str(p.id),
            "query_name": p.name,
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
            "input_rows_per_sec": p.inputRowsPerSecond,
            "process_rows_per_sec": p.processedRowsPerSecond,
            "batch_duration_ms": p.batchDuration,
            "recorded_at": time.time(),
        }
        with open(self._file, "a") as f:
            f.write(json.dumps(row) + "\n")

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryIdle(self, event) -> None:  # pragma: no cover - trivial
        pass


def attach(spark: SparkSession, table_path: str, query_name: str | None = None) -> IngestMetricsListener:
    lis = IngestMetricsListener(table_path, query_name)
    spark.streams.addListener(lis)
    return lis


def detach(spark: SparkSession, listener: IngestMetricsListener) -> None:
    spark.streams.removeListener(listener)


def read_metrics(spark: SparkSession, table_path: str) -> DataFrame:
    """The ingest-metrics table: one row per completed micro-batch."""
    return spark.read.json(os.path.join(table_path, METRICS_DIR))
