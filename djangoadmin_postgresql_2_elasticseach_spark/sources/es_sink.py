"""Elasticsearch-shaped bulk sink.

The reference delivers documents with the ES bulk API — pairs of
``{"index": {"_index": idx, "_id": id}}`` + doc, built at
``etl/main.py:163-169`` — and relies on index-by-``_id`` being an upsert
for at-least-once ⇒ effectively-once delivery (SURVEY §2.10 ST4).

Spark-first design: the executor-side writer is a ``foreachPartition``
that streams NDJSON bulk envelopes. One HTTP ``_bulk`` call per batch of
``batch_size`` docs per partition — the parallelism is Spark's partition
count, so a 1000-executor job drives 1000 concurrent bulk streams without
any driver involvement (no ``collect()``).

This container has no Elasticsearch, so the transport is pluggable:
``transport=None`` writes the exact NDJSON bulk payload to files
(one per partition) for assertion in tests; a real deployment passes
``transport=callable`` that POSTs each payload to ``/_bulk`` with
backoff (reference retries with ``backoff.expo`` at etl/main.py:141-143).
"""

from __future__ import annotations

import json
import os
import time
import uuid as _uuid
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame


def _bulk_lines(
    rows: Iterable[dict], index: str, id_field: str, action: str = "index"
) -> Iterator[str]:
    """Yield ES bulk NDJSON lines (reference etl/main.py:165-167):
    ``index`` emits action/doc pairs; ``delete`` emits the bare action
    line (the bulk API's delete carries no source)."""
    for row in rows:
        doc = {k: v for k, v in row.items()}
        if action == "delete":
            yield json.dumps(
                {"delete": {"_index": index, "_id": str(doc[id_field])}},
                ensure_ascii=False,
                default=str,
            )
            continue
        yield json.dumps(
            {"index": {"_index": index, "_id": str(doc[id_field])}},
            ensure_ascii=False,
            default=str,
        )
        yield json.dumps(doc, ensure_ascii=False, default=str)


def write_bulk(
    df: DataFrame,
    index: str,
    id_field: str = "id",
    batch_size: int = 500,
    transport: Callable[[str], None] | None = None,
    spool_dir: str | None = None,
    max_retries: int = 5,
    backoff_base: float = 0.5,
    action: str = "index",
) -> None:
    """Deliver ``df`` as ES bulk payloads, one stream per partition.

    Executor-side only; no data returns to the driver. With
    ``transport=None`` each partition spools its payloads to
    ``spool_dir/part-<uuid>.ndjson`` (test/file mode).
    ``action='delete'`` emits bulk delete actions instead of index
    pairs (df then only needs ``id_field``).
    """
    if transport is None and spool_dir is None:
        raise ValueError("need transport or spool_dir")
    if action not in ("index", "delete"):
        raise ValueError(f"unknown bulk action {action!r}")
    lines_per_doc = 1 if action == "delete" else 2

    def handle_partition(it):
        buf: list[str] = []

        def flush():
            if not buf:
                return
            payload = "\n".join(buf) + "\n"
            if transport is not None:
                # Exponential backoff mirrors the reference's
                # @backoff.on_exception(expo, ...) (etl/main.py:141-143).
                for attempt in range(max_retries):
                    try:
                        transport(payload)
                        break
                    except Exception:
                        if attempt == max_retries - 1:
                            raise
                        time.sleep(backoff_base * (2**attempt))
            else:
                os.makedirs(spool_dir, exist_ok=True)
                fname = os.path.join(spool_dir, f"part-{_uuid.uuid4().hex}.ndjson")
                with open(fname, "a", encoding="utf-8") as f:
                    f.write(payload)
            buf.clear()

        rows = (r.asDict(recursive=True) for r in it)
        n_lines = 0
        for line in _bulk_lines(rows, index, id_field, action):
            buf.append(line)
            n_lines += 1
            if n_lines >= lines_per_doc * batch_size:
                flush()
                n_lines = 0
        flush()

    df.foreachPartition(handle_partition)


def bootstrap_index_settings(settings_path: str) -> dict:
    """Load index settings+mappings JSON (reference etl/main.py:296-311
    creates the index from etl/json/es_*.json if absent). Returns the
    parsed body; the caller PUTs it to the cluster out-of-band."""
    with open(settings_path, "r", encoding="utf-8") as f:
        return json.load(f)


def write_bulk_cdc(
    changes: DataFrame,
    snapshot: DataFrame,
    index: str,
    key: str,
    change_col: str = "change",
    **bulk_kw,
) -> None:
    """Index maintenance driven by CDC output (``txlog.tx_changes``):
    inserts/updates re-deliver the key's CURRENT doc from ``snapshot``
    (index-by-``_id`` is an upsert — reference etl/main.py:163-169), and
    deletes emit bulk delete actions, which the reference's insert-only
    loop cannot express.

    Scale shape: ``changes`` is CDC-sized (tx_changes reads only the
    manifests' symmetric-difference files), so it broadcasts into a
    semi-join against the snapshot — the table is scanned once and
    never shuffled; at 100 TB a small merge's re-index touches the few
    rewritten files' keys only. ``bulk_kw`` forwards to write_bulk
    (batch_size / transport / spool_dir / retries).
    """
    from pyspark.sql import functions as F

    # materialize the CDC frame ONCE: the upsert and delete filters
    # would otherwise each re-execute the full tx_changes plan (two
    # version-diff reads + a full-outer struct compare) — it is
    # CDC-sized by contract, so the checkpoint is small
    changes = changes.select(key, change_col).localCheckpoint(eager=True)
    upserted = changes.filter(F.col(change_col) != "delete").select(key)
    docs = snapshot.join(F.broadcast(upserted), key, "left_semi")
    write_bulk(docs, index, id_field=key, **bulk_kw)
    deletes = changes.filter(F.col(change_col) == "delete").select(key)
    write_bulk(deletes, index, id_field=key, action="delete", **bulk_kw)
