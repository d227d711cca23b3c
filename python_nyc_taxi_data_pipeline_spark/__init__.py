"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline (Blackbeard23/python-nyc-taxi-data-pipeline).

The reference (see SURVEY.md) is a PostgreSQL medallion ETL: bronze
incremental watermark loads, silver dedup + typed fact, gold aggregate
views.  This package re-expresses every operator Spark-first:

- ``session``    — tuned SparkSession factory (AQE, NTZ timestamps, UTC)
- ``catalog``    — path-based parquet catalog for the test fixtures
- ``registry``   — query registry backing ``__spark_entry__.py``
- ``functions``  — scalar function library (SURVEY §2.8)
- ``operators``  — dedup / upsert / watermark operators (§2.5, §2.7, §2.9)
- ``plans``      — end-user queries: gold-view analogs, TPC-H-ish plans
- ``streaming``  — event-time windowing (tumbling/sliding/session) + streams
- ``llm``        — large-scale training-data ops: dedup, similarity, text
- ``pipeline``   — the medallion pipeline driver (bronze/silver/gold/meta)
"""

__version__ = "0.1.0"
