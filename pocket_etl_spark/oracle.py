"""Order-insensitive DataFrame comparison utilities (the driver-gate contract):
row count + column set + value hash over sorted columns/rows. Used by the local
oracle harness (tools/check_oracle.py) and the pytest query gate."""

from __future__ import annotations

import hashlib

import pandas as pd

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        col = pdf[c]
        if str(col.dtype).startswith("datetime"):
            pdf[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype.kind == "f":
            pdf[c] = col.round(9).astype(str)
        else:
            pdf[c] = col.astype(str)
    rows = sorted("\x1f".join(r) for r in pdf.itertuples(index=False, name=None))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()


def compare_frames(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """Return a list of problems (empty = match)."""
    problems: list[str] = []
    if len(got) != len(want):
        problems.append(f"rows {len(got)} != {len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        return problems
    if not problems and value_hash(got) != value_hash(want):
        problems.append("value hash mismatch")
        cols = sorted(got.columns)
        g = got[cols].astype(str).sort_values(cols).reset_index(drop=True)
        w = want[cols].astype(str).sort_values(cols).reset_index(drop=True)
        for c in cols:
            if not g[c].equals(w[c]):
                i = (g[c] != w[c]).idxmax()
                problems.append(f"col {c} first diff @{i}: {g[c][i]!r} vs {w[c][i]!r}")
    return problems


def duckdb_oracle(sql: str, sf_dir: str):
    """Run oracle SQL on DuckDB with the driver's pre-registered views."""
    import duckdb

    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con.sql(sql).df()
