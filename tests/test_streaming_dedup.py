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


def test_streaming_neardup_dedup_via_persisted_index(spark, tmp_path):
    """Cross-batch near-dups are dropped against the persisted MinHash
    index; intra-batch near-dups keep the lowest id; a SECOND streaming
    query (fresh checkpoint — a restart) still drops dups of docs kept
    by the first run because the state IS the index on disk."""
    from djangoadmin_postgresql_2_elasticseach_spark.streaming.dedup import (
        streaming_neardup_dedup,
    )

    t1 = "the quick brown fox jumps over the lazy dog near the river bank"
    t2 = "completely different content about spark structured streaming state"
    t3 = "unrelated third document mentioning parquet row groups and codecs"
    src = str(tmp_path / "docs")
    os.makedirs(src)
    _write_doc_file(spark, src, [(1, t1), (2, t2)])
    # file 2: exact near-dup of doc 1 (cross-batch), one new doc, and an
    # intra-batch dup pair (5 dups 4 -> 4 kept)
    _write_doc_file(spark, src, [(3, t1), (4, t3), (5, t3)])

    index_path = str(tmp_path / "mh_index")
    out_path = str(tmp_path / "clean")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = streaming_neardup_dedup(
        stream, index_path, out_path, str(tmp_path / "ckpt1"), available_now=True
    )
    q.awaitTermination(180)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out_path).collect())
    assert kept == [1, 2, 4]
    idx_docs = {r["doc_id"] for r in spark.read.parquet(index_path).collect()}
    assert idx_docs == {1, 2, 4}

    # restart: new source dir, new checkpoint — dup of doc 2 still dies
    src2 = str(tmp_path / "docs2")
    os.makedirs(src2)
    _write_doc_file(spark, src2, [(6, t2), (7, "a genuinely new sixth document here")])
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src2)
    )
    q2 = streaming_neardup_dedup(
        stream2, index_path, out_path, str(tmp_path / "ckpt2"), available_now=True
    )
    q2.awaitTermination(180)
    kept2 = sorted(r["doc_id"] for r in spark.read.parquet(out_path).collect())
    assert kept2 == [1, 2, 4, 7]
