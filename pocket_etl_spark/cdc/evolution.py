"""Schema evolution: promote tunnel fields to columns, widen types, conform frames.

The reference's envelope lets new fields "tunnel" through stages untouched
(EtlStreamObject.java:93-107,122-134); schema evolution there is implicit — new map
keys simply appear. In a schema-first lake that becomes an explicit, driver-side step
(SURVEY.md §4.2.4): before each merge we diff the batch schema against the table
schema, ADD new columns and widen conflicting numeric types (int→long→double lattice,
schema.widen), then cast both sides to the unified schema. Existing rows read NULL for
added columns — exactly what Iceberg's ADD COLUMN does."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pocket_etl_spark.schema import widen

EXTRAS_COL = "extras"
PROMOTE_PREFIX = "new_col_"


def discover_promotable_keys(df: DataFrame, extras_col: str = EXTRAS_COL, prefix: str = PROMOTE_PREFIX) -> list[str]:
    """Distinct tunnel-field names in the batch that are marked for promotion.

    One distributed aggregate over map_keys — no driver-side row iteration."""
    if extras_col not in df.columns:
        return []
    rows = (
        df.select(F.explode(F.map_keys(F.col(extras_col))).alias("k"))
        .filter(F.col("k").startswith(prefix))
        .distinct()
        .collect()
    )
    return sorted(r["k"] for r in rows)


def promote_extras(
    df: DataFrame,
    keys: list[str] | None = None,
    extras_col: str = EXTRAS_COL,
    prefix: str = PROMOTE_PREFIX,
) -> DataFrame:
    """Lift tunnel fields out of the extras map into real (string) columns.

    Type refinement happens later via the widen lattice if a typed batch arrives;
    strings are the safe landing type (reference parity: all tunnel values are
    Jackson strings)."""
    if keys is None:
        keys = discover_promotable_keys(df, extras_col, prefix)
    out = df
    for k in keys:
        out = out.withColumn(k, F.col(extras_col).getItem(k))
    return out


def unify_schemas(table_schema: T.StructType, batch_schema: T.StructType) -> T.StructType:
    """Table schema ∪ batch schema with type widening on conflicts.

    Column order: table columns first (stable layout), then new batch columns in
    batch order — matches Iceberg ALTER TABLE ADD COLUMN semantics."""
    fields: list[T.StructField] = []
    batch_by_name = {f.name: f for f in batch_schema.fields}
    for f in table_schema.fields:
        b = batch_by_name.get(f.name)
        if b is None or b.dataType == f.dataType:
            fields.append(f)
        else:
            fields.append(T.StructField(f.name, widen(f.dataType, b.dataType), True))
    known = {f.name for f in fields}
    for f in batch_schema.fields:
        if f.name not in known:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


def conform_to(df: DataFrame, schema: T.StructType, keep_extra: list[str] | None = None) -> DataFrame:
    """Project/cast ``df`` to ``schema``: missing columns become typed NULLs,
    conflicting types are cast (safe by construction — widen only widens).
    ``keep_extra`` columns (e.g. the op column) ride along untouched."""
    cols = []
    have = set(df.columns)
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    for extra in keep_extra or []:
        if extra in have:
            cols.append(F.col(extra))
    return df.select(*cols)
