from sparkify_datalake_spark.sources.load import TABLES, load

__all__ = ["TABLES", "load"]
