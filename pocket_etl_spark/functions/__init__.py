"""Column-function helpers shared by the query catalogue and operators.

Cross-engine exactness pattern: floating sums are computed as decimal sums
(exact, order-independent) and cast to double at the end, so Spark and any
ANSI oracle (DuckDB) produce bit-identical values regardless of partitioning —
required for the driver's order-insensitive value-hash comparison and, more
importantly, for run-to-run determinism at different cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,4)"


def dsum(col, alias: str | None = None) -> Column:
    """Exact sum of a floating column: cast→decimal→sum→double."""
    c = F.sum(F.col(col).cast(DEC) if isinstance(col, str) else col.cast(DEC)).cast("double")
    return c.alias(alias) if alias else c


def davg(col: str, alias: str | None = None) -> Column:
    """Deterministic average: exact decimal sum / non-null count, divided in double."""
    c = (F.sum(F.col(col).cast(DEC)).cast("double") / F.count(F.col(col)))
    return c.alias(alias) if alias else c


def md5_long(col) -> Column:
    """Deterministic 60-bit positive hash from md5 — reproducible in any engine
    (DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT). Used wherever a portable
    hash is needed (minhash/simhash/fingerprints); xxhash64 stays for internal
    partitioning where cross-engine parity is irrelevant."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, computed JVM-side with
    higher-order functions (no UDF): dot/(|a|·|b|) in double."""

    def _dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))
