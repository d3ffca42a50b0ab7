"""Streaming dedup: cross-micro-batch state (applyInPandasWithState)
and watermark-bounded built-in dedup. The duplicate in a LATER file must
be dropped by state carried from the earlier micro-batch — that is the
property a per-batch dropDuplicates cannot give."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_doc_file(spark, d: str, rows: list[tuple]) -> None:
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("append").parquet(d)


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    from djangoadmin_postgresql_2_elasticseach_spark.streaming.dedup import (
        streaming_exact_dedup,
    )

    src = str(tmp_path / "docs")
    os.makedirs(src)
    # file 1: two distinct docs + an intra-batch dup of doc 1
    _write_doc_file(spark, src, [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")])
    # file 2: cross-batch dup of doc 1 + one new doc
    _write_doc_file(spark, src, [(4, "alpha beta"), (5, "epsilon zeta")])

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    deduped = streaming_exact_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from dedup_out").collect()
    texts = sorted(r["text"] for r in out)
    assert texts == ["alpha beta", "epsilon zeta", "gamma delta"]
    # exactly one emission per distinct fingerprint
    assert len({r["fp"] for r in out}) == len(out) == 3


def test_streaming_dedup_watermarked(spark, tmp_path):
    from djangoadmin_postgresql_2_elasticseach_spark.streaming.dedup import (
        streaming_exact_dedup_watermarked,
    )

    src = str(tmp_path / "docs_wm")
    rows = [
        (1, "alpha beta", "2026-01-01 00:00:00"),
        (2, "alpha beta", "2026-01-01 00:01:00"),  # dup within horizon
        (3, "gamma delta", "2026-01-01 00:02:00"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts_s string").select(
        "doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(
        src
    )
    deduped = streaming_exact_dedup_watermarked(stream, ts_col="ts")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_wm_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select doc_id, text from dedup_wm_out").collect()
    assert sorted(r["text"] for r in out) == ["alpha beta", "gamma delta"]
