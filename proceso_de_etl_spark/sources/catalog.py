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
    - nanosAsLong: events.parquet generations that store
      TIMESTAMP(NANOS) throw PARQUET_TYPE_ILLEGAL without it;
    - inferTimestampNTZ off: generations that store naive
      TIMESTAMP(MICROS) must read as a UTC instant, not NTZ, so
      instant functions (unix_micros, window) resolve;
    - UTC session timezone: timestamp values must agree with
      UTC-naive ANSI engines (the DuckDB oracle)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down — proceed with whatever the host set


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts on disk varies by testdata generation: TIMESTAMP(NANOS)
        # (reads as epoch-nanos long under nanosAsLong) or naive
        # TIMESTAMP(MICROS) (reads as NTZ if a locked-down host
        # session kept NTZ inference on). Normalize both to a
        # Spark-native UTC instant; the naive values are UTC by the
        # generator's convention, so the NTZ→instant cast under the
        # pinned UTC session timezone is value-preserving.
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_catalog(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so plans can be written in SQL."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
