"""PySpark-native analytics engine with the query and data-processing
capabilities of elliottchang/wnba_data_pipeline (see SURVEY.md).

Brand-new Spark-first design: declarative DataFrame/SQL plans optimized by
Catalyst, not a translation of the reference's Airflow/pandas/DuckDB stack.

Layout
------
- ``session``    SparkSession factory (AQE on, tuned for local[32] testing,
                 scale-ready confs documented per setting).
- ``sources``    table loaders for the driver's parquet star schema, the
                 REST fan-out ingest adapter, and append/overwrite sinks.
- ``functions``  reusable Column-level expression library (avg_rank,
                 rolling means, cross-engine deterministic hashing,
                 text/vector expressions).
- ``operators``  query builders: relational (SURVEY §2 A-H), quality suite,
                 dedup, similarity search, text analysis + corpus curation,
                 multimodal (binary payload) processing, ML.
- ``plans``      reference-domain layer jobs (raw → analytics →
                 ml_features → dashboard) over canonical schemas.
- ``streaming``  Structured Streaming twins of the batch event queries.
"""

__version__ = "0.1.0"
