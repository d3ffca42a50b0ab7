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
