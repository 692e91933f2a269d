from proceso_de_etl_spark.sources.catalog import TABLES, load_table, register_catalog

__all__ = ["TABLES", "load_table", "register_catalog"]
