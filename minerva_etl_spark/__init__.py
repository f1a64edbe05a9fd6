"""minerva_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-implementation of the capabilities of the reference
platform hendrikx-itc/minerva-etl (entity/time-series "trend" ETL +
incremental materialization on PostgreSQL), re-expressed Spark-first:

- data model (entities, trend stores, attribute stores, notifications,
  relations, materializations, triggers) → parquet-backed tables + a
  Python catalog (``minerva_etl_spark.catalog``)
- generated-SQL query semantics (time/entity aggregation, upsert, SCD
  attribute history, triggers) → DataFrame/Spark-SQL builders
  (``minerva_etl_spark.operators``)
- incremental orchestration (modified log + fingerprint scheduler) →
  ``minerva_etl_spark.materialize``
- plus large-scale training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) that the 100 TB posture
  requires (``minerva_etl_spark.operators.dedup`` etc.)

Everything is built on the public Apache Spark DataFrame/SQL API; the
relational execution is Catalyst's job, exactly as it was PostgreSQL's
job in the reference.
"""

__version__ = "0.1.0"
