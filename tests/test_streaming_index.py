"""Structured-Streaming maintenance of the posting index
(streaming/stream.posting_index_stream) — the reference's 10 s PG→ES
polling loop (etl/main.py) as readStream→foreachBatch over the
incremental index tier. Pinned: micro-batched ingest is invisible to
served scores, a restarted stream continues the SAME index from its
checkpoint, and batch re-delivery is value-idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.search.bm25 import (
    bm25_topk,
    bm25_topk_from_index,
)
from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
    upsert_posting_index,
)
from djangoadmin_postgresql_2_elasticseach_spark.streaming.stream import (
    posting_index_stream,
)

ROWS = [
    (1, "spark shuffles data across the cluster"),
    (2, "the join strategy broadcasts small tables"),
    (3, "spark joins use hash partitioning everywhere"),
    (4, "vector embeddings power similarity search"),
    (5, "spark streaming handles late data with watermarks"),
    (6, "hash tables back the aggregation operator"),
    (7, "broadcast joins avoid shuffling the big side"),
    (8, "spark spark spark a tiny chant of spark"),
]
SCHEMA = "doc_id long, text string"
QUERY = "spark joins"


def _corpus(spark, rows=ROWS):
    return spark.createDataFrame(rows, SCHEMA)


def _drain(spark, src, idx, ckpt):
    q = posting_index_stream(
        spark,
        src,
        idx,
        ckpt,
        schema=_corpus(spark).schema,
        fields=("text",),
        id_col="doc_id",
        max_files_per_trigger=1,
        available_now=True,
    )
    q.awaitTermination()


def _topk(spark, idx, k=10):
    return [
        (r.doc_id, r.score)
        for r in bm25_topk_from_index(spark, idx, QUERY, k=k).collect()
    ]


def test_multi_batch_drain_equals_one_shot_scan(spark, tmp_path):
    src = str(tmp_path / "incoming")
    idx = str(tmp_path / "posting")
    corpus = _corpus(spark)
    # two file chunks → maxFilesPerTrigger=1 forces ≥2 upsert ticks
    corpus.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    corpus.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, idx, str(tmp_path / "ckpt"))
    want = [
        (r.doc_id, r.score) for r in bm25_topk(corpus, QUERY, k=10).collect()
    ]
    assert _topk(spark, idx) == want


def test_restart_with_new_files_continues_same_index(spark, tmp_path):
    src = str(tmp_path / "incoming")
    idx = str(tmp_path / "posting")
    ckpt = str(tmp_path / "ckpt")
    first = [r for r in ROWS if r[0] <= 5]
    late = [r for r in ROWS if r[0] > 5]
    _corpus(spark, first).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, idx, ckpt)
    seen_first = _topk(spark, idx)
    assert seen_first  # the first drain served something
    # stream "stops"; new files arrive; a NEW availableNow drain on the
    # SAME checkpoint picks up only the delta and upserts into the same
    # index — the restarted reference loop
    _corpus(spark, late).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, idx, ckpt)
    want = [
        (r.doc_id, r.score)
        for r in bm25_topk(_corpus(spark), QUERY, k=10).collect()
    ]
    assert _topk(spark, idx) == want


def test_replayed_batch_is_value_idempotent(spark, tmp_path):
    """foreachBatch replays a failed batch with the same contents; an
    index upsert re-delivered re-tombstones + re-adds the SAME doc
    versions, so served scores cannot change (the no-marker design
    the module docstring commits to)."""
    src = str(tmp_path / "incoming")
    idx = str(tmp_path / "posting")
    corpus = _corpus(spark)
    corpus.coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, idx, str(tmp_path / "ckpt"))
    before = _topk(spark, idx)
    replayed = corpus.filter(F.col("doc_id") % 2 == 0)
    upsert_posting_index(replayed, idx, fields=("text",), id_col="doc_id")
    assert _topk(spark, idx) == before
    # and the index files stay a real directory tree (no torn artifacts)
    assert os.path.exists(os.path.join(idx, "_index_meta.json"))


def test_stream_maintains_stored_fields_tier(spark, tmp_path):
    """r13: `store_cols` passthrough — a STREAM-maintained index
    establishes and maintains the docstore tier exactly like the batch
    CDC sink: after two micro-batch ticks, GET-by-id and DSL payload
    serving run with ZERO corpus reads (every input file lives inside
    the index directory)."""
    from djangoadmin_postgresql_2_elasticseach_spark.search.dsl import (
        search_indexed,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
        fetch_docs,
        read_docstore,
        read_posting_meta,
    )

    rows = [(i, t, f"s{i % 3}") for i, t in ROWS]
    corpus = spark.createDataFrame(rows, "doc_id long, text string, src string")
    src = str(tmp_path / "incoming")
    idx = str(tmp_path / "posting")
    corpus.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    corpus.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = posting_index_stream(
        spark,
        src,
        idx,
        str(tmp_path / "ckpt"),
        schema=corpus.schema,
        fields=("text",),
        id_col="doc_id",
        max_files_per_trigger=1,
        available_now=True,
        store_cols=("src",),
    )
    q.awaitTermination()
    # the first micro-batch established the stored-fields config
    assert read_posting_meta(idx)["store_cols"] == ["src"]
    # GET-by-id serves payload from the index tree only
    got = fetch_docs(spark, idx, [1, 4])
    assert all(idx in f for f in got.inputFiles())
    assert {(r.doc_id, r.src) for r in got.collect()} == {(1, "s1"), (4, "s1")}
    # a DSL body over the docstore: zero corpus reads end-to-end
    store = read_docstore(spark, idx)
    resp = search_indexed(
        spark, store, {"query": {"match": {"text": "broadcast"}}}, idx,
        id_col="doc_id",
    )
    assert {h["_id"] for h in resp["hits"]["hits"]} == {"2", "7"}
