"""cost_of_living_data_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL (`AidanFarhi/cost-of-living-data-etl`, see SURVEY.md),
extended with a relational query layer and large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
streaming) designed for 100 TB scale.

Layout
------
- ``session``    — SparkSession factory (AQE, Arrow, sane shuffle sizing)
- ``sources``    — lake CSV readers, parquet table loaders, warehouse sinks
- ``functions``  — reusable native Column expression helpers (no row UDFs)
- ``plans``      — the ETL pipeline (reference parity) + query catalog
- ``operators``  — dedup / similarity / text-analysis / multimodal ops
- ``streaming``  — Structured Streaming jobs over the events table
"""

__version__ = "0.1.0"
