"""Per-key last-writer-wins dedupe — the heart of the CDC apply stage.

The reference achieves LWW per batch by deleting matching keys then inserting the
staged rows (RedshiftJdbcClient.java:279-291); within a batch the last write to a key
wins implicitly. We refine that to an explicit, deterministic per-event rule:
winner(key) = argmax over (lsn, op_rank) — op_rank breaks same-LSN ties as D > U > I.

Scale design — why groupBy/max_by and not a window:

- ``row_number() OVER (PARTITION BY key ORDER BY lsn DESC)`` shuffles EVERY row of a
  key to one reducer: a hot key (50% of a 10^10-event log) lands 5·10^9 rows on one
  task. That plan melts at scale.
- ``groupBy(key).agg(max_by(payload, ord))`` is a commutative-associative aggregate:
  Spark performs map-side partial aggregation, so each input partition first collapses
  its local rows per key to ONE row, and only those partials shuffle. The hot key
  contributes at most one row per upstream partition — skew is absorbed before the
  exchange. This is the same trick as the reference's per-thread buffering
  (ParallelLoader.java:156-167), done by Tungsten's hash aggregate.

An explicit two-phase salted variant is provided for completeness and for plans where
a window is genuinely required (e.g. top-N per key with N>1); bench compares them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pocket_etl_spark.schema import LSN_COL, OP_COL, OP_RANK


def OP_RANK_EXPR(op_col: str = OP_COL):
    """Deterministic tie-break rank for same-LSN events: D(3) > U(2) > I(1);
    NULL op (current table rows in the merge union) ranks 0 so any same-LSN
    incoming event replaces them (idempotent replay)."""
    expr = F.lit(0)
    for op, rank in OP_RANK.items():
        expr = F.when(F.col(op_col) == op, F.lit(rank)).otherwise(expr)
    return expr


def lww_dedupe(
    df: DataFrame,
    key_cols: list[str],
    lsn_col: str = LSN_COL,
    op_col: str = OP_COL,
) -> DataFrame:
    """One row per key: the event with max (lsn, op_rank).

    Single hash-aggregate; map-side combine makes it skew-proof (see module doc).
    """
    payload = [c for c in df.columns if c not in key_cols]
    ord_expr = F.struct(F.col(lsn_col), OP_RANK_EXPR(op_col))
    return (
        df.groupBy(*key_cols)
        .agg(F.max_by(F.struct(*payload), ord_expr).alias("_w"))
        .select(*key_cols, "_w.*")
    )


def lww_dedupe_salted(
    df: DataFrame,
    key_cols: list[str],
    lsn_col: str = LSN_COL,
    op_col: str = OP_COL,
    num_salts: int = 16,
) -> DataFrame:
    """Explicit two-phase salted dedupe (SURVEY.md §4.2.2).

    Phase 1 groups by (key, salt) — a hot key's rows spread across ``num_salts``
    reducers; phase 2 reduces the ≤num_salts survivors per key to the global winner.
    Result is identical to lww_dedupe (argmax is associative); kept as the explicit
    skew-split demonstration and for window-shaped plans AQE can't rescue.
    """
    payload = [c for c in df.columns if c not in key_cols]
    ord_expr = F.struct(F.col(lsn_col), OP_RANK_EXPR(op_col))
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(num_salts)))
    phase1 = (
        salted.groupBy(*key_cols, "_salt")
        .agg(F.max_by(F.struct(*payload), ord_expr).alias("_w"))
        .select(*key_cols, "_w.*")
    )
    return lww_dedupe(phase1, key_cols, lsn_col=lsn_col, op_col=op_col)


def lww_dedupe_window(
    df: DataFrame,
    key_cols: list[str],
    lsn_col: str = LSN_COL,
    op_col: str = OP_COL,
) -> DataFrame:
    """Window-function formulation (row_number = 1). Same result; shuffles whole keys
    to single reducers, so it is the NON-scale path — used as a correctness
    cross-check in tests and as the bench's skew counter-example."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(lsn_col).desc(), OP_RANK_EXPR(op_col).desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def detect_hot_keys(
    df: DataFrame, key_cols: list[str], threshold_fraction: float = 0.05, max_keys: int = 32
) -> list[tuple]:
    """Per-batch hot-key histogram: keys holding more than ``threshold_fraction`` of
    the batch. Used for lineage/metrics and to pick salting for window-shaped plans.
    One aggregate pass; cheap relative to the merge itself."""
    total = df.count()
    if total == 0:
        return []
    cutoff = max(1, int(total * threshold_fraction))
    rows = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cutoff)
        .orderBy(F.col("_n").desc())
        .limit(max_keys)
        .collect()
    )
    return [tuple(r[k] for k in key_cols) for r in rows]
