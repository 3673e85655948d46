"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC query; ``queries()``/``oracle_sql()`` expose
the operator catalogue from pocket_etl_spark.queries (one entry per implemented
operator family from SURVEY.md §2, each DuckDB-oracle-checked at sf=0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pocket_etl_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC last-writer-wins apply (dedupe by max LSN, drop deletes)
    over the sf0.001 events stream — the engine's core operator in one query."""
    return QUERIES["cdc_apply_upsert"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
