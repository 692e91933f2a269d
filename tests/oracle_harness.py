"""Local replica of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle SQL on the same parquet
tables, then compares row count, column names, and canonicalized
values. Deliberately STRICTER than any plausible driver hash: floats
compare by exact repr (the engine's dsum/davg aggregates are
engineered to be bit-identical across engines — see
functions/columns.py), so a pass here implies a pass under any
order-insensitive value hash.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import pandas as pd

from proceso_de_etl_spark.sources.catalog import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        # derived scale tiers are Spark-written DIRECTORIES of part
        # files; the shipped testdata tiers are single files
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, pd.Timestamp | datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list | tuple):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if hasattr(v, "tolist") and getattr(v, "ndim", 0) >= 1:  # numpy array
        return "[" + ",".join(_canon_cell(x) for x in v.tolist()) + "]"
    return str(v)


def canonicalize(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    pdf = pdf[sorted(pdf.columns)]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    got = spark_df.toPandas()
    want = con.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rowcount {len(got)} != {len(want)}"
    g, w = canonicalize(got), canonicalize(want)
    mism = [i for i, (a, b) in enumerate(zip(g, w)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: got={g[mism[0]]} want={w[mism[0]]}"
    )
