"""Live-Elasticsearch smoke, gated on ``ES_URL`` (skipped in this
container, which has no ES). Replays the exact ``_bulk`` payloads the
spool-mode tests assert on against a real cluster: index → refresh →
count, idempotent re-delivery (index-by-_id upsert — reference
etl/main.py:163-169, ST4), and bulk delete actions.

Run: ``ES_URL=http://localhost:9200 python -m pytest tests/test_es_live.py``
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest

from djangoadmin_postgresql_2_elasticseach_spark.sources.es_sink import write_bulk

ES_URL = os.environ.get("ES_URL", "").rstrip("/")
pytestmark = pytest.mark.skipif(
    not ES_URL, reason="set ES_URL to run against a live Elasticsearch"
)

INDEX = "spark_graft_live_smoke"


def _http(method: str, path: str, body: bytes | None = None,
          ctype: str = "application/json") -> dict:
    req = urllib.request.Request(
        ES_URL + path, data=body, method=method,
        headers={"Content-Type": ctype},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read() or b"{}")


def _transport(payload: str) -> None:
    """Executor-side /_bulk POST; raises on transport OR item errors so
    write_bulk's backoff retries (idempotent by _id, so safe)."""
    resp = _http("POST", "/_bulk", payload.encode("utf-8"),
                 "application/x-ndjson")
    if resp.get("errors"):
        bad = [i for i in resp["items"]
               if list(i.values())[0].get("status", 200) >= 300]
        raise RuntimeError(f"bulk item errors: {bad[:3]}")


def _count() -> int:
    _http("POST", f"/{INDEX}/_refresh")
    return _http("GET", f"/{INDEX}/_count")["count"]


def test_live_bulk_index_idempotence_and_delete(spark):
    try:
        _http("DELETE", f"/{INDEX}")
    except urllib.error.HTTPError as e:
        if e.code != 404:
            raise
    docs = spark.range(0, 5).selectExpr(
        "cast(id as string) as id", "concat('title ', id) as title"
    )
    write_bulk(docs, INDEX, id_field="id", transport=_transport)
    assert _count() == 5

    # at-least-once re-delivery is a no-op on doc count (upsert by _id)
    write_bulk(docs, INDEX, id_field="id", transport=_transport)
    assert _count() == 5

    # bulk delete actions remove by _id
    write_bulk(docs.limit(2), INDEX, id_field="id", action="delete",
               transport=_transport)
    assert _count() == 3
    _http("DELETE", f"/{INDEX}")
