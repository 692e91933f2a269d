from proceso_de_etl_spark.functions.columns import clean_id, davg, dsum, money

__all__ = ["clean_id", "davg", "dsum", "money"]
