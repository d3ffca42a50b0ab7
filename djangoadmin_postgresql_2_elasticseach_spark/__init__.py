"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference repo GennadyBr/DjangoAdmin_PostgreSQL_2_ElasticSeach
(batch migration, incremental denormalizing ETL, filtered array-aggregation
API queries, full-text search surface), re-expressed Spark-first, plus
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Architecture: DataFrame/Catalyst only — no RDDs, no row-at-a-time Python
UDFs in hot paths. Explicit StructType schemas (schemas.py), Parquet
storage, incremental-batch ETL with a JSON checkpoint store mirroring the
reference's State (reference: etl/models_state.py:22-66), and a Structured
Streaming wrapper for the polling loop (reference: etl/main.py:357-385).
"""

__version__ = "0.1.0"
