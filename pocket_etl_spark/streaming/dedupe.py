"""Source-side streaming duplicate elimination for the CDC tail.

The reference's SqsExtractor eliminates duplicate queue deliveries with an
in-memory LinkedHashSet as messages are pulled (SqsExtractor.java:190-232).
The streaming-native equivalent is stateful drop-duplicates bounded by the
event-time watermark: an exact re-delivery (same key + lsn) within the
watermark delay is dropped BEFORE it costs shuffle/merge work downstream.

This is an optimization, not a correctness requirement — the lake merge is
idempotent for exact duplicates regardless (lake.py: tie collapse on
(key, _ord)); dropping them at the source just avoids paying the apply path
for them. State size is bounded by (keys x delay window), evicted by the
watermark — the same bound the reference's visibility timeout implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pocket_etl_spark.schema import KEY_COLS, LSN_COL


def drop_redeliveries(
    events: DataFrame,
    key_cols: list[str] | None = None,
    lsn_col: str = LSN_COL,
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop exact duplicate deliveries (same key + LSN) from a STREAMING frame,
    keeping state only within ``delay`` of the event-time watermark.

    Apply between ``read_wal_stream`` and the foreachBatch sink; batch frames
    should use plain ``dropDuplicates`` instead (no watermark needed)."""
    keys = list(key_cols or KEY_COLS) + [lsn_col]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
