"""kickstarter_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline (simon-ramirez28/Kickstarter-ETL-Pipeline,
``src/etl_pipeline.py``): CSV/Parquet extraction, star-schema
transformation + load (dimensions with dense surrogate keys, broadcast
fact joins), data-quality inspection — plus the large-scale extensions a
training-data pipeline needs (dedup, similarity search, text analysis,
streaming analytics).

Everything is declared against the DataFrame / Spark SQL API so Catalyst
picks the physical plan: predicate pushdown and column pruning reach the
Parquet scans, dimension joins broadcast, and AQE handles skew/partition
coalescing at scale.
"""

__version__ = "0.1.0"
