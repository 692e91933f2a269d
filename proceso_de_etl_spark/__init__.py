"""proceso_de_etl_spark — a PySpark-native analytics/ETL engine.

Brand-new engine with the query and data-processing capabilities of
the reference ETL pipeline (ITLA-Dextron03/Proceso-de-ETL, surveyed in
SURVEY.md), re-expressed Spark-first: declarative DataFrame/SQL plans
optimized by Catalyst, designed for multi-executor clusters at large
scale and tested locally.
"""

from proceso_de_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
