"""Catalog over the synthetic testdata star schema.

Tables live as one parquet file per table under an sf-dir
(``/root/testdata/sf0.01`` etc.). ``load_table`` returns a lazily
planned DataFrame — Catalyst prunes columns and pushes filters into
the parquet scan, so callers never pre-materialize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Defensive: the engine's queries may be called with a session
    the HOST built (e.g. the graft driver), which won't carry our
    factory configs. Two are load-bearing for correctness and are
    runtime-settable, so pin them here:
    - nanosAsLong: events.parquet is TIMESTAMP(NANOS); without it the
      scan throws PARQUET_TYPE_ILLEGAL;
    - UTC session timezone: timestamp values must agree with
      UTC-naive ANSI engines (the DuckDB oracle)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down — proceed with whatever the host set


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is TIMESTAMP(NANOS) on disk; with nanosAsLong it reads
    # as epoch-nanos long. Convert to Spark-native micros (lossless for
    # this data — generator emits whole microseconds).
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_catalog(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so plans can be written in SQL."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
