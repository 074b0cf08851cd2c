"""PySpark-native analytics engine with the capability surface of
Edo199599/databricks-sales-etl-pipeline (medallion sales ETL: typed ingest,
data-quality validation, incremental append, aggregation analytics, scheduled
recompute), extended with LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) designed for 100 TB scale.

Everything here is idiomatic DataFrame/SQL-API Spark: declare the logical
plan, let Catalyst/AQE pick the physical strategy. Python UDFs appear only as
Arrow-vectorized pandas UDFs where built-in functions genuinely cannot
express the semantics.
"""

__version__ = "0.1.0"

from databricks_sales_etl_pipeline_spark.session import get_spark  # noqa: F401
