"""sparkify_datalake_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine covering the full operator inventory of
SURVEY.md §2: relational scans/joins/aggregates/windows, scalar function
families, text/dedup/similarity (LLM-data-pipeline) operators, streaming
window semantics, and the UDF/UDAF/UDTF surface.

Reference note: /root/reference (leila-saghar/sparkify-datalake) is an empty
mount (SURVEY.md §0); the binding spec is SURVEY.md §2 and the driver
contract in __spark_entry__.py. Every operator here is expressed with the
public PySpark DataFrame/SQL API so Catalyst/Tungsten/AQE pick the physical
strategy; design notes for 100 TB scale live in each module's docstring.
"""

from sparkify_datalake_spark.registry import QUERIES, ORACLES, queries, oracle_sql
from sparkify_datalake_spark.session import get_spark, configure_session
from sparkify_datalake_spark.sources.load import load, TABLES

__all__ = [
    "QUERIES",
    "ORACLES",
    "queries",
    "oracle_sql",
    "get_spark",
    "configure_session",
    "load",
    "TABLES",
]
