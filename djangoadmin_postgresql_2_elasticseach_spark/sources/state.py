"""Checkpoint state store for incremental-batch ETL.

Spark-side equivalent of the reference's ``JsonFileStorage``/``State``
pair (reference ``etl/models_state.py:22-66``): a tiny JSON dict mapping
state-key → last-processed ``modified`` timestamp string, read before a
run and committed only AFTER a successful sink write (reference
``etl/main.py:174-177`` commits after ``es.bulk`` returns).

This is driver-side metadata (a few bytes), NOT data-plane state —
at 100 TB the checkpoint is still one tiny JSON file; the heavy lifting
(which rows changed) happens as a pushed-down predicate in the scan.
Structured Streaming mode uses Spark's own checkpointLocation instead
(streaming/stream.py).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import tempfile

# Cold-start sentinel: missing state ⇒ full backfill
# (reference etl/main.py:364 uses str(datetime.min)).
DATETIME_MIN = str(_dt.datetime.min)  # "0001-01-01 00:00:00"


class JsonFileState:
    """Atomic JSON-file key→value state store."""

    def __init__(self, path: str):
        self.path = path

    def _read(self) -> dict:
        # Missing file ⇒ {} (reference models_state.py:41-45).
        if not os.path.exists(self.path):
            return {}
        with open(self.path, "r", encoding="utf-8") as f:
            return json.load(f)

    def get_state(self, key: str, default: str = DATETIME_MIN) -> str:
        return self._read().get(key, default)

    def set_state(self, key: str, value: str) -> None:
        state = self._read()
        state[key] = value
        # Atomic replace so a crash mid-write never corrupts the checkpoint.
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(state, f)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)


def atomic_write_text(path: str, text: str) -> None:
    """Crash-safe small-file write: tmpfile in the target dir + rename.
    Shared by the checkpoint store and the table-layout / batch-id
    markers (writers.upsert_by_key, streaming.stream.rollup_stream)."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
