"""Streaming heavy hitters — count-min state per group via
``applyInPandasWithState``.

Extension operator (ST surface × the sketch family): "which users
crossed N events?" over an unbounded stream, with state bounded at
d×w counters PER GROUP no matter how many distinct users flow through
— the streaming twin of ``operators/sketches.cms_heavy_hitters``.

The state is a flattened count-min table (array<long>, d·w cells) plus
the running total. CMS updates are ADDITIVE and order-insensitive, so
the emitted estimates are deterministic for a given set of delivered
batches regardless of row order within them — unlike Misra-Gries
summaries, whose content depends on arrival order. The cell hashes are
the SAME md5-window scheme as the batch operator (python hashlib here,
Spark ``md5`` there — both hash str(value)), so a streaming run's
estimates are comparable 1:1 with a batch ``cms_estimate`` over the
union of the delivered data (pinned by test).

Per micro-batch each group emits the batch's DISTINCT values whose
updated estimate reaches ``threshold`` — the one-sided CMS guarantee
makes that candidate stream complete (a true heavy hitter is emitted
in the first batch that lifts it over the line; re-emission in later
batches is expected — consumers treat it as a changelog, dedupe by
key, or verify exactly like the batch operator's verify stage).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _cells(value, d: int, w: int) -> list[int]:
    digest = hashlib.md5(str(value).encode("utf-8")).hexdigest()
    return [int(digest[i * 8 : (i + 1) * 8], 16) % w for i in range(d)]


def _hh_fn(value_col: str, threshold: int, d: int, w: int):
    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        if state.exists:
            counts = list(state.get[0])
            total = state.get[1]
        else:
            counts = [0] * (d * w)
            total = 0
        seen_vals = set()
        for pdf in pdfs:
            for v in pdf[value_col]:
                if v is None:
                    continue
                for i, c in enumerate(_cells(v, d, w)):
                    counts[i * w + c] += 1
                total += 1
                seen_vals.add(v)
        state.update((counts, total))
        out = []
        for v in sorted(seen_vals):
            est = min(
                counts[i * w + c] for i, c in enumerate(_cells(v, d, w))
            )
            if est >= threshold:
                out.append((key[0], v, est, total))
        yield pd.DataFrame(
            out, columns=["group", value_col, "est_count", "group_total"]
        )

    return fn


def streaming_heavy_hitters(
    events_stream: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    threshold: int = 100,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """(group, value, est_count, group_total) changelog stream of
    values whose count-min estimate reached ``threshold`` within their
    group. State: d·w longs + 1 per group, ever."""
    if not 1 <= d <= 4:
        raise ValueError("d must be 1..4 (one md5 digest = 4 words)")
    keyed = events_stream.select(group_col, value_col)
    out_schema = (
        f"group string, {value_col} long, est_count long, group_total long"
    )
    state_schema = "counts array<long>, total long"
    return keyed.groupBy(group_col).applyInPandasWithState(
        _hh_fn(value_col, threshold, d, w),
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
