"""Incremental denormalizing ETL — the reference's polling pipeline
(reference etl/main.py:357-385) as checkpointed incremental batch.

Semantics preserved exactly:
- strict ``modified > checkpoint`` (reference etl/main.py:35,46,57; rows
  at exactly the checkpoint are EXCLUDED — FIXTURES.md edge 8);
- dependency recompute (ST6): a person/genre edit re-emits every
  affected movie doc, via the 3-way OR of the reference's movies
  predicate, with ``modified = greatest(fw, max(p), max(g))`` as the
  doc's change-version (reference etl/main.py:26);
- checkpoint commits AFTER a successful sink write, value = max
  ``modified`` of the emitted batch (reference etl/main.py:174-177);
- cold start: missing state ⇒ datetime.min ⇒ full backfill (ST5).

Scale design: the reference's predicate puts the OR inside one big join
query — at 100 TB that forces a full scan of all five tables every tick.
Here each dimension is filtered FIRST (pushed-down ``modified > ckpt``
scan, partition-prunable when stored time-partitioned), the affected
film-id set is the union of three small key sets, and the heavy denorm
join runs only over those keys (semi-join pruning). Unchanged films are
never touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.denorm import film_changeset, genre_docs, movie_docs, person_docs
from ..session import free_local_checkpoint
from ..sources.state import DATETIME_MIN, JsonFileState

MOVIES_KEY = "last_movies_updated"   # reference etl/main.py:62
GENRES_KEY = "last_genres_updated"   # reference etl/main.py:63
PERSONS_KEY = "last_persons_updated"  # reference etl/main.py:64


def _ckpt_col(ckpt: str):
    return F.lit(ckpt).cast("timestamp")


def changed_film_ids(
    film_work: DataFrame,
    genre: DataFrame,
    person: DataFrame,
    genre_film_work: DataFrame,
    person_film_work: DataFrame,
    ckpt: str,
) -> DataFrame:
    """Film ids affected since ckpt: own edit OR related person/genre
    edit (the reference's ``fw.modified > %s OR p.modified > %s OR
    g.modified > %s``, etl/main.py:35) — computed as three pruned scans +
    semi-joins instead of one full-table OR."""
    own = film_work.filter(F.col("modified") > _ckpt_col(ckpt)).select(
        F.col("id").alias("film_id")
    )
    changed_p = (
        person.filter(F.col("modified") > _ckpt_col(ckpt))
        .select(F.col("id").alias("p_id"))
    )
    via_person = person_film_work.join(
        F.broadcast(changed_p), person_film_work.person_id == changed_p.p_id
    ).select(F.col("film_work_id").alias("film_id"))
    changed_g = (
        genre.filter(F.col("modified") > _ckpt_col(ckpt))
        .select(F.col("id").alias("g_id"))
    )
    via_genre = genre_film_work.join(
        F.broadcast(changed_g), genre_film_work.genre_id == changed_g.g_id
    ).select(F.col("film_work_id").alias("film_id"))
    return own.unionByName(via_person).unionByName(via_genre).distinct()


def changed_movie_docs(tables: dict[str, DataFrame], ckpt: str) -> DataFrame:
    """Movies index docs for every film affected since ckpt."""
    affected = changed_film_ids(
        tables["film_work"],
        tables["genre"],
        tables["person"],
        tables["genre_film_work"],
        tables["person_film_work"],
        ckpt,
    )
    fw = tables["film_work"].join(
        affected, tables["film_work"].id == affected.film_id, "left_semi"
    )
    changeset = film_changeset(
        fw,
        tables["genre"],
        tables["person"],
        tables["genre_film_work"],
        tables["person_film_work"],
    )
    return movie_docs(changeset)


def changed_genre_docs(tables: dict[str, DataFrame], ckpt: str) -> DataFrame:
    """Genres docs for genres with modified > ckpt (reference
    etl/main.py:46: only the genre's own timestamp drives it)."""
    g = tables["genre"].filter(F.col("modified") > _ckpt_col(ckpt))
    return genre_docs(g, tables["genre_film_work"], tables["film_work"])


def changed_person_docs(tables: dict[str, DataFrame], ckpt: str) -> DataFrame:
    """Persons docs for persons with modified > ckpt (reference
    etl/main.py:57)."""
    p = tables["person"].filter(F.col("modified") > _ckpt_col(ckpt))
    return person_docs(p, tables["person_film_work"])


class IncrementalEtl:
    """One-tick driver: compute changed docs → sink → commit checkpoint.

    ``sink`` is a callable(DataFrame, entity_name) that must complete
    before the checkpoint advances (at-least-once; the ES-shaped sink is
    idempotent by _id, so the composition is effectively-once — ST4).
    """

    ENTITIES = {
        "movies": (MOVIES_KEY, changed_movie_docs),
        "genres": (GENRES_KEY, changed_genre_docs),
        "persons": (PERSONS_KEY, changed_person_docs),
    }

    def __init__(self, state: JsonFileState, tables: dict[str, DataFrame], sink):
        self.state = state
        self.tables = tables
        self.sink = sink

    def run_once(self, entity: str) -> int:
        key, builder = self.ENTITIES[entity]
        ckpt = self.state.get_state(key, DATETIME_MIN)
        docs = builder(self.tables, ckpt).cache()
        try:
            n = docs.count()
            if n == 0:
                return 0
            self.sink(docs, entity)
            # commit AFTER successful sink (reference etl/main.py:174-177)
            new_ckpt = docs.agg(F.max("modified")).first()[0]
            if new_ckpt is not None:
                self.state.set_state(key, str(new_ckpt))
            return n
        finally:
            docs.unpersist()

    def run_tick(self) -> dict[str, int]:
        """One poll tick over all three entities (reference runs them
        sequentially per tick, etl/main.py:363-379)."""
        return {e: self.run_once(e) for e in self.ENTITIES}


ROLLUP_KEY = "last_rollup_ts"


def rollup_tick(
    spark,
    events: DataFrame,
    rollup_path: str,
    state: JsonFileState,
    state_key: str = ROLLUP_KEY,
) -> int:
    """One incremental-maintenance tick of a daily (day × event_type)
    rollup — materialized-view upkeep in O(|delta|), never a re-scan of
    history.

    The maintained table is parquet partitioned by ``p_day`` with
    mergeable partials: ``n_events`` (count) and ``sum_value`` (exact
    DECIMAL sum — order-independent, so merge order can never change the
    result). A tick:

    1. reads the checkpoint and scans ONLY ``ts > ckpt`` (pushed-down;
       partition-prunable when events are stored time-partitioned);
    2. partially aggregates the delta per (day, type);
    3. reads back JUST the affected day-partitions of the rollup
       (partition-pruned by the in-list on ``p_day``), merges by summing
       partials, and rewrites ONLY those partitions via dynamic
       partition overwrite — untouched history is never read or written;
    4. commits ``max(ts)`` of the delta to the checkpoint AFTER the
       write (commit-after-sink, same contract as the ETL above).

    The merged frame is eagerly materialized (``localCheckpoint``)
    before the write because source and destination are the same
    partitions — lazy evaluation would otherwise read files mid-replace.
    Its size is bounded by affected-days × |event types| — never corpus-
    sized. Returns the number of delta rows absorbed.

    At 100 TB: each tick touches ``O(delta + affected_partitions)``
    bytes; a late event for an old day triggers exactly one partition
    rewrite. This is the standard mergeable-partial incremental
    aggregation (the same shape Structured Streaming keeps in its state
    store) realized over a plain parquet table any engine can read.
    """
    import os

    from ..sources.state import atomic_write_text

    ckpt = state.get_state(state_key, DATETIME_MIN)
    delta = events.filter(F.col("ts") > _ckpt_col(ckpt))
    # Replay guard: the merge is NOT idempotent, so a crash between the
    # rollup write and the checkpoint commit must not re-merge the same
    # delta. `_merged_from` records which checkpoint the last merge
    # consumed, committed atomically AFTER the data write and BEFORE
    # the checkpoint advance. On restart with an unchanged checkpoint
    # the marker matches → skip the merge, just advance the checkpoint.
    # Residual window: a crash between the (multi-file) rollup write
    # and the marker write still replays — plain parquet has no atomic
    # multi-partition commit; exactly-once here needs a transactional
    # table format (sources/txlog.py implements the manifest-commit
    # primitive; a partition-aware integration is the documented swap).
    marker = os.path.join(rollup_path, "_merged_from")
    already = False
    if os.path.exists(marker):
        with open(marker, "r", encoding="utf-8") as f:
            already = f.read() == ckpt
    if already:
        row = delta.agg(
            F.count(F.lit(1)).alias("n"), F.max("ts").alias("m")
        ).first()
        n, new_ckpt = int(row["n"]), row["m"]
    else:
        n, new_ckpt = merge_rollup_delta(spark, delta, rollup_path)
        if n:
            atomic_write_text(marker, ckpt)
    if new_ckpt is not None:
        state.set_state(state_key, str(new_ckpt))
    return n


def merge_rollup_delta(spark, delta: DataFrame, rollup_path: str):
    """Merge one delta frame into the rollup table (the shared core of
    batch ``rollup_tick`` and streaming ``rollup_stream``). Returns
    ``(rows_absorbed, max_ts_of_delta)``; (0, None) on an empty delta.
    """
    import os

    part = (
        delta.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
                "p_day"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # Spark widens sum(decimal(18,6)) to decimal(28,6); pin the
            # stored type so every write (fresh partition or merged
            # rewrite) lands the SAME parquet physical type — mixed
            # precisions across partitions fail the read-back
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("sum_value"),
            F.max("ts").alias("_max_ts"),
        )
        .cache()
    )
    try:
        # ONE bounded driver action for everything the tick needs from
        # the delta aggregate — affected days, absorbed-row count, new
        # checkpoint — instead of the three separate jobs (days
        # distinct-collect + n sum + max-ts) the r5 shape paid; the
        # result is affected-days × |event types| rows by construction,
        # never corpus-sized (see the rollup_tick docstring)
        summary = part.agg(
            F.collect_set("p_day").alias("days"),
            F.sum("n_events").alias("n"),
            F.max("_max_ts").alias("m"),
        ).first()
        days = sorted(summary["days"])
        if not days:
            return 0, None
        merged = part.drop("_max_ts")
        # "exists" means real day-partitions — the dir may hold only
        # bookkeeping files (e.g. rollup_stream's _last_batch_id marker)
        has_data = os.path.isdir(rollup_path) and any(
            f.startswith("p_day=") for f in os.listdir(rollup_path)
        )
        if has_data:
            old = (
                spark.read.parquet(rollup_path)
                .filter(F.col("p_day").isin(days))
                .select("p_day", "event_type", "n_events", "sum_value")
            )
            merged = (
                merged.unionByName(old)
                .groupBy("p_day", "event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_value")
                    .cast("decimal(18,6)")
                    .alias("sum_value"),
                )
            )
        merged = merged.localCheckpoint(eager=True)
        try:
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("p_day")
                .parquet(rollup_path)
            )
        finally:
            # dead once the rewrite lands; DataFrame.unpersist would NOT
            # free localCheckpoint blocks (see session.free_local_checkpoint)
            free_local_checkpoint(merged)
        return int(summary["n"] or 0), summary["m"]
    finally:
        part.unpersist()


HLL_ROLLUP_KEY = "last_hll_rollup_ts"


def hll_rollup_tick(
    spark,
    events: DataFrame,
    registers_path: str,
    state: JsonFileState,
    state_key: str = HLL_ROLLUP_KEY,
    group_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 12,
) -> int:
    """One incremental tick of a DISTINCT-count rollup maintained as an
    HLL register table (operators/sketches.py) — the sketch counterpart
    of ``rollup_tick``: approx distinct users per group over ALL history
    in O(|delta| + groups × 2^p) per tick, with history never rescanned.

    Unlike the count/sum rollup, the register MAX-merge is IDEMPOTENT —
    replaying a delta after a crash between write and checkpoint commit
    cannot corrupt the registers (max(a, a) = a) — so this tick needs NO
    ``_merged_from`` replay guard: the crash-replay window that is only
    *documented* for the additive rollup is structurally closed here.
    That asymmetry is the operational argument for sketch-backed
    distinct rollups at 100 TB.

    The register table is ≤ groups × 2^p rows regardless of history
    size; the whole-table overwrite goes through an eager
    localCheckpoint (same read-before-overwrite hazard as
    ``merge_rollup_delta``), blocks freed after the write.
    """
    import os

    from ..operators.sketches import hll_registers

    ckpt = state.get_state(state_key, DATETIME_MIN)
    delta = events.filter(F.col("ts") > _ckpt_col(ckpt))
    row = delta.agg(
        F.count(F.lit(1)).alias("n"), F.max("ts").alias("m")
    ).first()
    n, new_ckpt = int(row["n"]), row["m"]
    if n == 0:
        return 0
    regs = hll_registers(delta, value_col, [group_col], p)
    has_data = os.path.isdir(registers_path) and any(
        f.endswith(".parquet") for f in os.listdir(registers_path)
    )
    if has_data:
        old = spark.read.parquet(registers_path).select(
            group_col, "idx", "rho"
        )
        regs = (
            regs.unionByName(old)
            .groupBy(group_col, "idx")
            .agg(F.max("rho").alias("rho"))
        )
    merged = regs.localCheckpoint(eager=True)
    try:
        merged.write.mode("overwrite").parquet(registers_path)
    finally:
        free_local_checkpoint(merged)
    if new_ckpt is not None:
        state.set_state(state_key, str(new_ckpt))
    return n


def hll_rollup_estimate(
    spark, registers_path: str, group_col: str = "event_type", p: int = 12
) -> DataFrame:
    """Grouped approx-distinct read model over the maintained register
    table — (group, approx_distinct), identical to what a one-shot
    ``hll_distinct`` over ALL history would return (pinned by test:
    merge-then-estimate == estimate-of-union, the HLL mergeability
    law)."""
    from ..operators.sketches import hll_estimate

    regs = spark.read.parquet(registers_path)
    return hll_estimate(regs, [group_col], p)
