"""Incremental-batch ETL (the reference's polling loop, Spark-first) and
the Structured Streaming wrapper."""
