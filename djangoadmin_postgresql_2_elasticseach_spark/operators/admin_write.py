"""Admin write path — the reference's Django admin save surface
(reference my_app/movies/models.py, my_app/movies/admin.py) as
DataFrame merges.

- ``admin_save``: a ModelAdmin form save batch against an entity table:
  field-level validation (reference models.py:106-108 — rating bounded
  0..100 by Min/MaxValueValidator; models.py:111-115 — ``type``
  restricted to choices), ``auto_now_add``/``auto_now`` audit stamping
  (models.py:9-13 TimeStampedMixin: ``created`` set once on insert,
  ``modified`` refreshed on every save), partial-column updates (a form
  submits only its editable fields), and inserts for unknown PKs.
- ``admin_inline_save``: the TabularInline add/delete flow on a bridge
  table (admin.py:38-45 — GenreFilmworkInline / PersonFilmworkInline):
  deletes by PK, inserts with ``created`` stamped (bridge models carry
  only auto_now_add — models.py:27-52), PK collisions rejected loudly.

Both are PURE transformations — they return the merged frame and leave
persistence to the caller (``sources/writers.upsert_by_key`` for the
bucket-partitioned copy-on-write path, or the tx-log table for ACID).
The downstream contract is the reference's: a saved row's ``modified``
moves forward, so the incremental ETL's strict ``>`` checkpoint scan
(streaming/incremental.py) picks the edit up on its next tick and
re-indexes the affected documents — verified end-to-end in
tests/test_admin_write.py.

Determinism: Django stamps ``timezone.now()`` and generates uuid4 PKs
at save time; both are non-reproducible, so here ``now`` is an explicit
required argument and inline adds must carry their PK — the caller owns
id/clock generation (the driver-facing divergence is documented, not
hidden).

Scale: the edit batch is a human-sized form save — it is broadcast, so
the table side never shuffles. One full scan produces the merged
output (any merge must rewrite what it touches); the insert-key check
adds one column-pruned PK-projection scan, and its semi-join output is
bounded by |edits|. At 100 TB route the result through upsert_by_key:
only the hash buckets containing edited PKs are rewritten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_edits(
    edits: DataFrame,
    validators: dict[str, Column] | None = None,
    choices: dict[str, list] | None = None,
) -> None:
    """Django field validation over an edit batch: every ``validators``
    entry is a boolean Column that must hold wherever the field is
    non-NULL (NULL passes — ``blank=True``/``null=True`` fields);
    ``choices`` pins a column to an allowed value list. Any violation
    raises ValueError with per-rule counts (the admin refuses the whole
    form on a ValidationError; a silent partial save would diverge).
    One aggregation job over the (broadcast-sized) batch."""
    rules: dict[str, Column] = {}
    for col, ok in (validators or {}).items():
        rules[f"{col}:validator"] = F.col(col).isNull() | ok
    for col, allowed in (choices or {}).items():
        rules[f"{col}:choices"] = F.col(col).isNull() | F.col(col).isin(
            list(allowed)
        )
    if not rules:
        return
    counts = edits.agg(
        *[
            F.sum(F.when(~ok, 1).otherwise(0)).alias(name)
            for name, ok in rules.items()
        ]
    ).first()
    bad = {name: counts[name] for name in rules if (counts[name] or 0) > 0}
    if bad:
        raise ValueError(f"admin_save validation failed: {bad}")


def _check_pks(batch: DataFrame, pk: str) -> None:
    """A save batch must carry one row per non-NULL PK: a duplicate
    would FAN OUT the update join (silent row duplication in the merged
    table) and a NULL PK would ghost-insert a keyless row — both are
    caller bugs Django's form layer makes impossible, so they raise.
    One aggregation over the (broadcast-sized) batch."""
    row = batch.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(pk).alias("n_pk"),
        F.count_distinct(pk).alias("n_distinct"),
    ).first()
    if row["n_pk"] != row["n"]:
        raise ValueError(f"{row['n'] - row['n_pk']} edit row(s) have NULL {pk}")
    if row["n_distinct"] != row["n"]:
        raise ValueError(
            f"edit batch has {row['n'] - row['n_distinct']} duplicate {pk}(s)"
        )


def admin_save(
    table: DataFrame,
    edits: DataFrame,
    pk: str = "id",
    now=None,
    created_col: str = "created",
    modified_col: str = "modified",
    validators: dict[str, Column] | None = None,
    choices: dict[str, list] | None = None,
) -> DataFrame:
    """Apply an admin form-save batch to an entity table; returns the
    merged table (same schema).

    ``edits`` carries ``pk`` plus any subset of the table's data
    columns — exactly the fields the form edits. Submitted values win
    verbatim (including an explicit NULL: a cleared ``blank=True``
    field); columns a form doesn't carry are untouched on update and
    NULL on insert. Audit columns follow TimeStampedMixin
    (models.py:9-13): ``created`` is stamped only on insert
    (``auto_now_add``), ``modified`` on every save (``auto_now``) —
    neither may appear in ``edits`` (they are not ``editable``).

    ``now`` is the save timestamp (datetime or SQL literal string) —
    explicit, because reproducible pipelines cannot stamp wall-clock
    inside a transformation. Validation (``validators``/``choices``)
    runs first and raises on any bad row — see validate_edits.
    """
    if now is None:
        raise ValueError("admin_save requires an explicit `now` timestamp")
    audit = {created_col, modified_col}
    if audit & set(edits.columns):
        raise ValueError(
            f"audit columns {sorted(audit & set(edits.columns))} are not "
            "editable — created/modified are stamped, never submitted"
        )
    unknown = set(edits.columns) - set(table.columns)
    if unknown:
        raise ValueError(f"edit columns {sorted(unknown)} not in table")
    _check_pks(edits, pk)
    validate_edits(edits, validators, choices)
    now_lit = F.lit(now).cast("timestamp")
    edit_cols = [c for c in edits.columns if c != pk]

    t = table.alias("t")
    e = edits.alias("e")
    # update pass: one scan of the table, edits broadcast — the table
    # side never shuffles. _hit marks matched rows (non-nullable, so a
    # NULL pk in an edit row can never masquerade as a miss).
    e_marked = e.select("*", F.lit(True).alias("_hit"))
    updated = t.join(F.broadcast(e_marked), pk, "left").select(
        *[
            F.when(F.col("_hit").isNotNull(), F.col(f"e.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            if c in edit_cols
            else (
                F.when(F.col("_hit").isNotNull(), now_lit)
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                if c == modified_col
                else F.col(f"t.{c}").alias(c)
            )
            for c in table.columns
        ]
    )
    # insert pass: edit keys absent from the table. The PK projection
    # is column-pruned; the semi-join builds on the broadcast batch so
    # its output is <= |edits| rows.
    existing = table.select(pk).join(F.broadcast(edits.select(pk)), pk, "left_semi")
    inserts = edits.join(F.broadcast(existing), pk, "left_anti").select(
        *[
            F.col(c)
            if c in edits.columns
            else (
                now_lit.alias(c)
                if c in (created_col, modified_col)
                else F.lit(None).cast(dict(table.dtypes)[c]).alias(c)
            )
            for c in table.columns
        ]
    )
    return updated.unionByName(inserts)


def admin_inline_save(
    bridge: DataFrame,
    adds: DataFrame | None = None,
    deletes: DataFrame | None = None,
    pk: str = "id",
    now=None,
    created_col: str = "created",
) -> DataFrame:
    """TabularInline save on a bridge table (admin.py:38-45): drop the
    rows whose PKs are in ``deletes``, append ``adds`` with ``created``
    stamped (bridge models are auto_now_add-only — models.py:27-33,
    36-52). An add whose PK already exists raises: Django would never
    produce one (fresh uuid4 per inline row), so a collision here is a
    caller bug, not an upsert. Both sides of every join broadcast the
    (form-sized) batch; the bridge never shuffles."""
    out = bridge
    if deletes is not None:
        out = out.join(F.broadcast(deletes.select(pk)), pk, "left_anti")
    if adds is not None:
        if now is None:
            raise ValueError("inline adds require an explicit `now`")
        if created_col in adds.columns:
            raise ValueError(f"{created_col} is stamped, never submitted")
        unknown = [c for c in adds.columns if c not in set(bridge.columns)]
        if unknown:
            # same strictness as admin_save: a misspelled column must
            # raise, not silently drop and null-fill the real one
            raise ValueError(
                f"inline-add columns {unknown} not in bridge table "
                f"{bridge.columns}"
            )
        _check_pks(adds, pk)
        clash = bridge.select(pk).join(
            F.broadcast(adds.select(pk)), pk, "left_semi"
        )
        if deletes is not None:
            clash = clash.join(F.broadcast(deletes.select(pk)), pk, "left_anti")
        n_clash = clash.count()
        if n_clash:
            raise ValueError(
                f"{n_clash} inline add(s) collide with existing bridge PKs"
            )
        stamped = adds.select(
            *[
                F.col(c) if c in adds.columns else (
                    F.lit(now).cast("timestamp").alias(c)
                    if c == created_col
                    else F.lit(None).cast(dict(bridge.dtypes)[c]).alias(c)
                )
                for c in bridge.columns
            ]
        )
        out = out.unionByName(stamped)
    return out
