"""Streaming deduplication — the training-data-pipeline counterpart of
operators/dedup.py for unbounded document streams.

Two paths, different state contracts:

- ``streaming_exact_dedup``: custom stateful operator via
  ``applyInPandasWithState`` keyed by content fingerprint. Emits the
  FIRST occurrence of each fingerprint ever seen and counts the rest —
  state (one counter per distinct fingerprint) lives in the state store,
  scales horizontally with shuffle partitions, and survives restarts via
  checkpointLocation. Unbounded state: at 100 TB/day of near-unique docs
  pair it with a TTL (GroupStateTimeout) or use the watermark variant.

- ``streaming_exact_dedup_watermarked``: built-in
  ``dropDuplicatesWithinWatermark`` on the fingerprint with an event-time
  watermark — state is bounded by the watermark horizon (duplicates
  arriving later than the delay slip through; that is the documented
  trade for bounded state at scale).

The reference has no streaming dedup (its ETL is idempotent-by-id at the
sink, reference etl/main.py:70,169); this is a BASELINE.json north-star
extension operator.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.textstats import fingerprint
from ..session import free_local_checkpoint

STATE_SCHEMA = "n_seen long"


def _first_seen_fn(out_cols: list[str]):
    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
        emitted = state.exists
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if not emitted:
                yield pdf.iloc[[0]][out_cols]
                emitted = True
            n += len(pdf)
        state.update((n,))

    return fn


def streaming_exact_dedup(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """First-occurrence filter over an unbounded document stream, keyed
    by md5 content fingerprint (same fingerprint as the batch operator —
    a doc already emitted in ANY earlier micro-batch is dropped).

    Output: (fp, id, text) append-mode stream of unique-content docs.
    The groupBy hashes fingerprints across shuffle partitions, so state
    is horizontally partitioned; only (fp → counter) lives in the store,
    never document bodies.
    """
    fp = docs_stream.select(
        fingerprint(text_col).alias("fp"),
        F.col(id_col),
        F.col(text_col),
    )
    out_cols = ["fp", id_col, text_col]
    out_schema = f"fp string, {id_col} long, {text_col} string"
    return fp.groupBy("fp").applyInPandasWithState(
        _first_seen_fn(out_cols),
        out_schema,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup_watermarked(
    docs_stream: DataFrame,
    ts_col: str,
    delay: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """Bounded-state streaming dedup: built-in
    ``dropDuplicatesWithinWatermark`` on the content fingerprint.
    Keeps every column; duplicates within the watermark horizon are
    dropped, state older than the horizon is evicted automatically."""
    fp = docs_stream.withColumn("fp", fingerprint(text_col))
    return fp.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(["fp"])


def streaming_neardup_dedup(
    docs_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    available_now: bool = False,
    trigger_seconds: int = 10,
    idempotent: bool = True,
):
    """NEAR-duplicate filtering over an unbounded document stream, built
    on the persisted MinHash band index (operators/dedup.py): each
    micro-batch is deduplicated against every document kept so far —
    cross-batch AND cross-restart — then appended to both the clean
    corpus at `out_path` and the index itself.

    Per micro-batch: (1) `incremental_dedup_pairs` joins the batch's
    broadcast band frame against the index scan (the corpus is never
    re-shingled — see the batch operator for the scale contract);
    (2) batch docs matching an indexed doc are dropped; (3) survivors
    are self-deduplicated (lowest id per near-dup pair wins, the same
    keeper rule as the batch operators); (4) survivors' text goes to
    `out_path`, their band rows to the index. State is the index itself
    — restartable and shared with batch consumers, unlike state-store
    operators; bucket_n staleness after appends is the documented
    conservative guard from build_minhash_index.

    Parquet appends inside foreachBatch are at-least-once on batch
    retry; with ``idempotent=True`` (default) both sinks are keyed by
    the doc id — the corpus append goes through
    writers.append_if_absent (the reference's ON CONFLICT DO NOTHING
    shape, same seam as the ES sink) and the index append anti-joins
    the ids already indexed — so a replayed micro-batch writes nothing
    twice (effectively-once). The flag exists because the extra
    id anti-join per batch is wasted work under a driver that never
    replays (e.g. exactly-once upstream of a transactional sink).
    """
    from ..operators.dedup import incremental_dedup_pairs, minhash_index_frame
    from ..sources.writers import append_if_absent

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col).localCheckpoint(eager=True)
        kept_ckpt = None
        try:
            try:
                idx = s.read.parquet(index_path)
            except Exception as e:  # first batch: no index yet
                if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                    raise
                idx = None
            kept = batch
            if idx is not None:
                dup_ids = (
                    incremental_dedup_pairs(
                        batch, idx, id_col, text_col, threshold=threshold
                    )
                    .select(F.col("new_id").alias(id_col))
                    .distinct()
                )
                kept = batch.join(dup_ids, id_col, "left_anti")
            intra_dups = (
                incremental_dedup_pairs(
                    kept,
                    minhash_index_frame(kept, id_col, text_col),
                    id_col,
                    text_col,
                    threshold=threshold,
                )
                .filter(F.col("old_id") < F.col("new_id"))
                .select(F.col("new_id").alias(id_col))
                .distinct()
            )
            kept = kept.join(intra_dups, id_col, "left_anti").localCheckpoint(
                eager=True
            )
            kept_ckpt = kept
            new_bands = minhash_index_frame(kept, id_col, text_col)
            if idempotent:
                append_if_absent(s, kept, out_path, key=id_col)
                if idx is not None:
                    new_bands = new_bands.join(
                        idx.select("doc_id").distinct(), "doc_id", "left_anti"
                    )
            else:
                kept.write.mode("append").parquet(out_path)
            new_bands.write.mode("append").partitionBy("band_idx").parquet(index_path)
        finally:
            # per-batch checkpoints are dead once the batch's writes land;
            # without this a long-running stream accumulates O(batches)
            # block-manager copies (DataFrame.unpersist would NOT free
            # them — see session.free_local_checkpoint)
            free_local_checkpoint(batch)
            if kept_ckpt is not None:
                free_local_checkpoint(kept_ckpt)

    writer = (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
