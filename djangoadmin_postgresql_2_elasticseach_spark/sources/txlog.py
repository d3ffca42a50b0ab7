"""Minimal transactional table log — atomic multi-file commits, snapshot
isolation, and time travel over a plain parquet directory.

Extension source (the published design core of Delta Lake [Armbrust et
al., VLDB 2020] / Iceberg: a table IS its log, not its directory
listing). Several operators here document a crash residual window —
`rollup_tick` (multi-partition rewrite vs `_merged_from` marker),
`zorder_maintain` (write-new-then-delete-old), `upsert_merge`
(bucket rewrites) — because plain parquet has no atomic multi-file
commit. This module provides exactly that primitive:

- data files are written with unique names and NEVER mutated;
- a commit is ONE atomic filesystem operation: claiming the next
  version file ``_txlog/v{n:012d}.json`` with O_CREAT|O_EXCL (POSIX
  exclusive create — the same primitive Delta uses on HDFS; object
  stores swap in a put-if-absent). The manifest lists the COMPLETE live
  file set of that version, so readers never reconstruct state from
  partial history;
- readers resolve the latest committed version and read only its
  files: a writer crash before commit leaves orphan data files that no
  reader ever sees (garbage, not corruption — `vacuum` reclaims them);
- concurrent writers race on the same version number; the loser gets
  FileExistsError, re-reads the new snapshot, and retries its commit
  against it (optimistic concurrency, the Delta protocol's loop).

Scale notes: a manifest stores file names only — at 10^6 files it is a
few tens of MB of JSON, read once per query plan, listed by ONE
directory read of `_txlog/` (vs the full-table listing a plain
directory scan pays); production formats add manifest checkpoints and
column stats per file (the `layout.file_skipping_stats` direction) —
orthogonal to the commit protocol shown here.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_txlog"


class CommitConflict(Exception):
    """Another writer claimed the version; re-read and retry."""


class TxLog:
    def __init__(self, path: str):
        self.path = path
        self.log_dir = os.path.join(path, _LOG_DIR)
        os.makedirs(self.log_dir, exist_ok=True)

    # -- snapshot resolution ------------------------------------------

    def versions(self) -> list[int]:
        return sorted(
            int(f[1:13])
            for f in os.listdir(self.log_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(
            os.path.join(self.log_dir, f"v{version:012d}.json"),
            encoding="utf-8",
        ) as f:
            return json.load(f)

    def snapshot(self, version: int | None = None) -> list[str]:
        """Live file names at ``version`` (default: latest). Empty list
        for an empty/new table."""
        v = self.latest_version() if version is None else version
        if v is None:
            return []
        return list(self._manifest(v)["files"])

    def table_schema(
        self, version: int | None = None
    ) -> list[tuple[str, str]] | None:
        """The manifest-recorded (name, dtype) schema at ``version``
        (default latest); None for pre-schema manifests or an empty
        table (readers then fall back to footer schemas)."""
        v = self.latest_version() if version is None else version
        if v is None:
            return None
        raw = self._manifest(v).get("schema")
        return [tuple(c) for c in raw] if raw is not None else None

    # -- commit protocol ----------------------------------------------

    def commit(
        self,
        files: list[str],
        op: str,
        expected_version: int | None = None,
        schema: list[tuple[str, str]] | None = None,
    ) -> int:
        """Atomically publish ``files`` as the COMPLETE live set of the
        next version. ``expected_version`` is the snapshot the writer
        based its work on (None for a blind append to an empty table);
        if another commit landed since, raises CommitConflict WITHOUT
        claiming the version — the caller re-reads and retries.

        ``schema`` — (name, dtype-DDL) pairs — is recorded in the
        manifest as the version's authoritative table schema (the Delta
        model: schema lives in the LOG, not in data-file footers).
        Readers apply it explicitly, so files written before an
        additive evolution null-fill the newer columns and a mixed-file
        scan can never silently drop a column that only some footers
        carry."""
        latest = self.latest_version()
        if expected_version is not None or latest is not None:
            if latest != expected_version:
                raise CommitConflict(
                    f"expected v{expected_version}, table is at v{latest}"
                )
        next_v = 0 if latest is None else latest + 1
        target = os.path.join(self.log_dir, f"v{next_v:012d}.json")
        manifest = {"version": next_v, "op": op, "files": sorted(files)}
        if schema is not None:
            manifest["schema"] = [list(c) for c in schema]
        payload = json.dumps(manifest, indent=0)
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:  # lost the race at the claim itself
            raise CommitConflict(str(e)) from e
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        return next_v

    # -- maintenance --------------------------------------------------

    def vacuum(self, retention_sec: float = 6 * 3600.0) -> int:
        """Delete data files not referenced by ANY version (orphans
        from crashed writers). Time travel keeps every committed file
        alive; expire old versions first to reclaim more.

        ``retention_sec`` is the Delta-style VACUUM retention window:
        unreferenced files YOUNGER than it are skipped, because
        ``_write_data_files`` publishes data files into the table dir
        BEFORE the manifest commit — a vacuum racing an in-flight
        append/merge would otherwise delete files the writer is about
        to commit, corrupting the next manifest (references to missing
        files), not just reclaiming orphans. The default is 6 HOURS,
        not minutes: ``os.replace`` preserves the write-time mtime, so
        retention must exceed the longest possible write-to-commit
        latency of ANY writer (a huge append whose commit — including
        conflict retries — lands long after its first files were
        published). Delta's default is 7 days for the same reason;
        size retention to your slowest writer, never below it. Pass 0
        only when no writer can be live (tests)."""
        import time

        live: set[str] = set()
        for v in self.versions():
            live |= set(self._manifest(v)["files"])
        now = time.time()
        removed = 0
        for f in os.listdir(self.path):
            if not f.endswith(".parquet") or f in live:
                continue
            full = os.path.join(self.path, f)
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue  # concurrently removed/committed — leave it
            if age < retention_sec:
                continue  # possibly an in-flight writer's file
            os.remove(full)
            removed += 1
        return removed


class SchemaEvolutionError(ValueError):
    """The write's schema is not an additive evolution of the table's."""


def _evolve_schema(
    cur: list[tuple[str, str]], new: list[tuple[str, str]]
) -> list[tuple[str, str]]:
    """Validate ``new`` (a write's df.dtypes) against the table schema
    ``cur`` and return the evolved manifest schema: ADDITIVE columns
    only — every existing column must be present with an identical
    type (drops and type changes need an explicit overwrite, which
    resets the schema). New columns append after the existing ones, in
    the write's order; old files simply null-fill them on read."""
    new_types = dict(new)
    for name, dtype in cur:
        if name not in new_types:
            raise SchemaEvolutionError(
                f"column {name!r} missing from write; dropping columns "
                "requires tx_overwrite"
            )
        if new_types[name] != dtype:
            raise SchemaEvolutionError(
                f"column {name!r} type change {dtype!r} -> "
                f"{new_types[name]!r}; type changes require tx_overwrite"
            )
    existing = {n for n, _ in cur}
    return list(cur) + [(n, t) for n, t in new if n not in existing]


def _schema_ddl(schema: list[tuple[str, str]]) -> str:
    return ", ".join(f"`{n}` {t}" for n, t in schema)


def _effective_schema(
    spark: SparkSession, log: "TxLog", path: str, version: int | None
) -> list[tuple[str, str]] | None:
    """The table schema a write must evolve against: the manifest-
    recorded schema when present, else — for PRE-SCHEMA manifests that
    still have data files — the footer-inferred dtypes of the current
    snapshot. Without this fallback, a write narrower than a
    pre-schema table would record ITS OWN dtypes as the authoritative
    manifest schema and every later read would silently project the
    missing columns away (r9 review finding). None only for an empty
    or never-committed table."""
    if version is None:
        return None
    s = log.table_schema(version)
    if s is not None:
        return s
    files = log.snapshot(version)
    if not files:
        return None
    return _read_files(spark, path, files, None).dtypes


def _read_files(
    spark: SparkSession,
    path: str,
    files: list[str],
    schema: list[tuple[str, str]] | None,
) -> DataFrame:
    """Read a file subset under the manifest schema when one is
    recorded: pre-evolution files null-fill newer columns, and a mixed
    old/new file set can never resolve to a footer that lacks a column
    (Spark's non-merge parquet read takes ONE footer's schema — without
    the manifest schema a column present only in newer files would be
    silently dropped)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(_schema_ddl(schema))
    return reader.parquet(*[os.path.join(path, f) for f in files])


def _write_data_files(df: DataFrame, table_path: str) -> list[str]:
    """Write df as fresh uniquely-named parquet files; return names.
    Files are invisible until a commit references them."""
    tmp = os.path.join(table_path, f"_tx_tmp_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(tmp)
    names = []
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            name = f"part-{uuid.uuid4().hex}.parquet"
            os.replace(os.path.join(tmp, f), os.path.join(table_path, name))
            names.append(name)
    shutil.rmtree(tmp, ignore_errors=True)
    return names


def tx_overwrite(df: DataFrame, path: str, max_retries: int = 10) -> int:
    """Replace the table contents atomically. An overwrite RESETS the
    manifest schema to the new frame's — the only path that may drop
    or retype columns."""
    log = TxLog(path)
    names = _write_data_files(df, path)
    for _ in range(max_retries):
        try:
            return log.commit(
                names, "overwrite", log.latest_version(), schema=df.dtypes
            )
        except CommitConflict:
            continue
    raise CommitConflict("overwrite retries exhausted")


def tx_append(df: DataFrame, path: str, max_retries: int = 10) -> int:
    """Append atomically: new snapshot = old snapshot + new files.
    On conflict, re-reads the WINNER's snapshot and re-commits on top —
    the written data files are reused, only the manifest race reruns.

    Additive schema evolution: the appended frame may carry NEW
    columns (recorded in the manifest; existing files null-fill them
    on read) but must include every existing column with its exact
    type — ``SchemaEvolutionError`` otherwise. Validation runs BEFORE
    the data files are written (a doomed append must not materialize
    the frame and leak retention-window orphans), then reruns per
    conflict retry against the winner's schema. The pre-check is only
    a fast-fail: a CONCURRENT commit can change the effective schema
    between it and the retry-loop validation — when that later
    validation raises, the already-written data files are removed
    eagerly (same cleanup as tx_compact's conflict abort), so the
    no-orphans guarantee holds under concurrency too, not just in the
    serial case (ADVICE r9)."""
    log = TxLog(path)
    spark = df.sparkSession
    pre = _effective_schema(spark, log, path, log.latest_version())
    if pre is not None:
        _evolve_schema(pre, df.dtypes)
    names = _write_data_files(df, path)
    try:
        for _ in range(max_retries):
            base = log.latest_version()
            cur_schema = _effective_schema(spark, log, path, base)
            schema = (
                _evolve_schema(cur_schema, df.dtypes)
                if cur_schema is not None
                else df.dtypes
            )
            try:
                return log.commit(
                    log.snapshot(base) + names, "append", base, schema=schema
                )
            except CommitConflict:
                continue
    except SchemaEvolutionError:
        # a concurrent winner evolved the schema out from under us
        # after the pre-check passed; our files were never referenced
        # by any manifest — remove them instead of leaving
        # retention-window orphans
        for n in names:
            os.remove(os.path.join(path, n))
        raise
    raise CommitConflict("append retries exhausted")


def tx_compact(
    spark: SparkSession, path: str, target_files: int, max_retries: int = 10
) -> int:
    """Rewrite the current snapshot as ``target_files`` files in ONE
    atomic commit — the transactional form of zorder_maintain/
    compact_parquet: no reader ever sees the half-replaced state, a
    crash leaves only orphans. Conflicts abort cleanly (compaction of a
    stale snapshot must re-plan, not re-commit)."""
    log = TxLog(path)
    base = log.latest_version()
    cur = log.snapshot(base)
    schema = log.table_schema(base)
    df = _read_files(spark, path, cur, schema)
    names = _write_data_files(df.coalesce(target_files), path)
    try:
        return log.commit(names, "compact", base, schema=schema)
    except CommitConflict:
        for n in names:  # our files are orphans; remove eagerly
            os.remove(os.path.join(path, n))
        raise


def _file_key_stats(table_path: str, files: list[str], key: str):
    """(file → (min, max)) of ``key`` from parquet footers — the
    manifest-stats read Delta keeps inline; footer reads are per-file
    metadata, never data pages."""
    import pyarrow.parquet as pq

    out = {}
    for f in files:
        md = pq.ParquetFile(os.path.join(table_path, f)).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == key and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out[f] = (lo, hi)
    return out


def tx_merge(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    max_retries: int = 3,
) -> int:
    """Atomic keyed MERGE (upsert) with FILE-LEVEL PRUNING: only data
    files whose footer [min, max] of ``key`` overlaps the update keys
    are rewritten; every other file carries over into the new manifest
    untouched. One commit swaps the snapshot — readers never see a
    half-merged table, a crash leaves orphans only. This is the Delta
    MERGE shape (stats-pruned copy-on-write) over the txlog primitive;
    at 100 TB the rewrite cost is bounded by the files the keys
    actually land in, which clustering (zorder_write on the key) makes
    few.

    Update rows REPLACE current rows with equal ``key``; new keys
    append. ``updates`` must contain at most one row per key.
    """
    from pyspark.sql import functions as F

    log = TxLog(path)
    for _ in range(max_retries):
        base = log.latest_version()
        cur = log.snapshot(base)
        # effective, not manifest-recorded: a pre-schema table's real
        # (footer) schema must win over a narrower updates frame, or
        # the commit would record the narrow schema and every later
        # read would project the other columns away
        cur_schema = _effective_schema(spark, log, path, base)
        schema = (
            _evolve_schema(cur_schema, updates.dtypes)
            if cur_schema is not None
            else updates.dtypes
        )
        if not cur:
            names = _write_data_files(updates, path)
            try:
                return log.commit(names, "merge", base, schema=schema)
            except CommitConflict:
                continue
        stats = _file_key_stats(path, cur, key)
        # per-file containment, not a single global update range — a
        # coarse [min(updates), max(updates)] envelope would drag in
        # every file between two distant keys. The stats frame is
        # manifest-sized; the range join broadcasts it and touches a
        # file iff SOME update key lands inside its [lo, hi].
        no_stats = [f for f, (lo, _) in stats.items() if lo is None]
        stats_df = spark.createDataFrame(
            [(f, lo, hi) for f, (lo, hi) in stats.items() if lo is not None],
            f"file string, lo {dict(updates.dtypes)[key]}, hi {dict(updates.dtypes)[key]}",
        ) if len(no_stats) < len(stats) else None
        hit = (
            [
                r["file"]
                for r in updates.alias("u")
                .join(
                    F.broadcast(stats_df),
                    (F.col(f"u.{key}") >= F.col("lo"))
                    & (F.col(f"u.{key}") <= F.col("hi")),
                )
                .select("file")
                .distinct()
                .collect()
            ]
            if stats_df is not None
            else []
        )
        touched = sorted(set(hit) | set(no_stats))
        untouched = [f for f in cur if f not in set(touched)]
        base_df = (
            _read_files(spark, path, touched, cur_schema)
            if touched
            else updates.limit(0)
        )
        # allowMissingColumns: an additive-evolution merge's updates
        # carry new columns the touched files lack — survivors null-fill
        merged = base_df.join(
            updates.select(key).withColumnRenamed(key, key),
            key,
            "left_anti",
        ).unionByName(updates, allowMissingColumns=True)
        names = _write_data_files(merged, path)
        try:
            return log.commit(untouched + names, "merge", base, schema=schema)
        except CommitConflict:
            for n in names:
                os.remove(os.path.join(path, n))
            continue
    raise CommitConflict("merge retries exhausted")


def tx_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot-isolated read (optionally time travel to ``version``).
    An empty table reads as an empty frame only if a version exists.
    Applies the version's manifest schema when recorded: time travel
    sees exactly that version's columns, and post-evolution reads
    null-fill new columns in pre-evolution files."""
    log = TxLog(path)
    files = log.snapshot(version)
    if not files:
        raise FileNotFoundError(f"no committed version in {path}")
    return _read_files(spark, path, files, log.table_schema(version))


def tx_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
    key: str,
) -> DataFrame:
    """Change-data-capture between two committed versions: one row per
    changed key — (key, change) with change ∈ insert/delete/update.

    Reads ONLY the files in the manifests' symmetric difference: a file
    carried over by name between versions cannot contribute a change,
    so at 100 TB a small merge's CDC touches the few rewritten files,
    never the table (the same pruning argument as tx_merge, applied to
    reads). Keys present in both sides with differing row content are
    'update'; row equality is null-safe across all columns.
    """
    from pyspark.sql import functions as F

    log = TxLog(path)
    a = set(log.snapshot(from_version))
    b = set(log.snapshot(to_version))
    only_a, only_b = sorted(a - b), sorted(b - a)
    if not only_a and not only_b:
        # identical manifests → no changes; derive the key type from a
        # live file so the empty frame still carries the right schema
        files = sorted(a) or sorted(b)
        if files:
            return (
                spark.read.parquet(os.path.join(path, files[0]))
                .select(key)
                .limit(0)
                .withColumn("change", F.lit(""))
            )
        return spark.createDataFrame([], f"{key} string, change string")

    old = (
        _read_files(spark, path, only_a, log.table_schema(from_version))
        if only_a
        else None
    )
    new = (
        _read_files(spark, path, only_b, log.table_schema(to_version))
        if only_b
        else None
    )
    if old is None:
        return new.select(key).distinct().withColumn("change", F.lit("insert"))
    if new is None:
        return old.select(key).distinct().withColumn("change", F.lit("delete"))
    # align across an additive schema evolution: a side missing a
    # column null-fills it, so a value landing in a NEW column counts
    # as an update (NULL vs value) instead of being invisible
    types = {**dict(old.dtypes), **dict(new.dtypes)}
    for c in new.columns:
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None).cast(types[c]))
    for c in old.columns:
        if c not in new.columns:
            new = new.withColumn(c, F.lit(None).cast(types[c]))
    cols = [c for c in old.columns]
    o = old.select(key, F.struct(*[F.col(c) for c in cols if c != key]).alias("_row"))
    n = new.select(key, F.struct(*[F.col(c) for c in cols if c != key]).alias("_row"))
    j = o.alias("o").join(n.alias("n"), key, "full_outer")
    return j.select(
        key,
        F.when(F.col("o._row").isNull(), F.lit("insert"))
        .when(F.col("n._row").isNull(), F.lit("delete"))
        .when(
            ~F.col("o._row").eqNullSafe(F.col("n._row")), F.lit("update")
        )
        .otherwise(F.lit(None))
        .alias("change"),
    ).filter(F.col("change").isNotNull())
