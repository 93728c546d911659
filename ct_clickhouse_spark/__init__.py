"""ct_clickhouse_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference CT-log analytics platform
(stefanpejcic/ct-clickhouse), re-expressed Spark-first.

Layout:
  session    — SparkSession factory tuned for columnar OLAP (AQE, Arrow, UTC)
  catalog    — explicit schemas + loaders for the fixture tables
  cert_domains — deterministic synthesis of the reference's one fact table
                 (reference: clickhouse/init.sql:3-18) from the fixtures
  api_queries  — the 8 reference REST query shapes (reference: api/app.py)
  operators/ — relational, window, dedup, similarity, text operators
  functions/ — scalar function layer (public-suffix, X.509 parse UDFs)
  sources/   — CT-log streaming source (Python DataSource API)
  streaming/ — Structured Streaming ingest pipeline
  serving/   — Flask API mirroring the reference endpoints
"""

__version__ = "0.1.0"
