"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship plan at sf0.001;
``queries()`` maps every implemented operator from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` pairs each
SQL-expressible one with ANSI SQL for the DuckDB gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from proceso_de_etl_spark.operators import (
    dedup,
    etl,
    events,
    ml,
    multimodal,
    pipeline,
    relational,
    sampling,
    scd,
    similarity,
    text_analysis,
    windows,
)
from proceso_de_etl_spark.plans import tpch, tpch_ext
from proceso_de_etl_spark.streaming import jobs as streaming_jobs

# Registration order IS gate order: the driver's correctness gate
# consumes queries() in this order and may truncate (round 1 stopped
# at 50), so the modules whose queries lacked a driver-side signal in
# round 1 (§2.3 training-data ops, streaming, SCD2, relational tail)
# come right after etl; the round-1-green analytic suites close the
# list.
_MODULES = (
    etl,
    dedup,
    similarity,
    text_analysis,
    multimodal,
    sampling,
    pipeline,
    ml,
    scd,
    streaming_jobs,
    relational,
    windows,
    events,
    tpch,
    tpch_ext,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full star-schema ETL (SURVEY.md §2.1
    E11) on /root/testdata/sf0.001; driver checks rows>0."""
    return etl.etl_star_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
