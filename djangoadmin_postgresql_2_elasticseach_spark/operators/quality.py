"""Declarative data-quality validation — constraint suites evaluated
in (mostly) a single scan.

Extension operator (the reference logs row counts per ETL tick —
`etl/main.py` batch logging — this generalizes that observability into
a constraint engine in the style of the published Deequ system,
Schelter et al., VLDB 2018 "Automating large-scale data quality
verification"): a pipeline writing 100 TB needs machine-checkable
gates — null rates, domains, ranges, key uniqueness, referential
integrity — evaluated WITHOUT one pass per constraint.

Scale shape:
- every ROW-LEVEL check (not_null / accepted_values / min_max / regex /
  custom predicate) compiles to one conditional-count aggregate; ALL of
  them run in ONE partial-aggregated scan of the table — adding a check
  adds a column to the aggregate, not a pass over the data;
- `unique` needs its own groupBy on the key (count>1 keys), map-side
  combined — one shuffle per distinct key-set, shared when several
  unique checks use the same key-set;
- `foreign_key` is an anti-join against the referenced keys; Catalyst
  broadcasts small reference sides automatically.

Output: one row per check — (check, target, violations, total, passed)
— the shape a quality gate consumes (fail the write when any
``passed`` is false).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ROW_LEVEL = {"not_null", "accepted_values", "min_max", "regex", "predicate"}


def _violation_cond(check: dict) -> Column:
    """Boolean column: TRUE when the row VIOLATES the check."""
    kind = check["check"]
    c = F.col(check["col"]) if "col" in check else None
    if kind == "not_null":
        return c.isNull()
    if kind == "accepted_values":
        return c.isNull() | ~c.isin(*check["values"])
    if kind == "min_max":
        cond = F.lit(False)
        if check.get("lo") is not None:
            cond = cond | (c < F.lit(check["lo"]))
        if check.get("hi") is not None:
            cond = cond | (c > F.lit(check["hi"]))
        return c.isNull() | cond
    if kind == "regex":
        return c.isNull() | ~c.rlike(check["pattern"])
    if kind == "predicate":
        # check["expr"]: SQL boolean the row must SATISFY
        return ~F.expr(check["expr"]) | F.expr(check["expr"]).isNull()
    raise ValueError(f"unknown row-level check: {kind}")


def _target(check: dict) -> str:
    if "cols" in check:
        return ",".join(check["cols"])
    if "col" in check:
        return check["col"]
    return check.get("expr", "")


def run_checks(
    df: DataFrame, checks: list[dict], refs: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Evaluate a constraint suite. ``checks`` entries:

    - ``{"check": "not_null", "col": c}``
    - ``{"check": "accepted_values", "col": c, "values": [...]}``
    - ``{"check": "min_max", "col": c, "lo": x, "hi": y}`` (either bound
      optional; NULL violates — pair with not_null semantics)
    - ``{"check": "regex", "col": c, "pattern": p}``
    - ``{"check": "predicate", "expr": sql_bool}`` (row must satisfy)
    - ``{"check": "unique", "cols": [c, ...]}`` — violations = rows in
      excess of one per duplicated key (0 when fully unique)
    - ``{"check": "foreign_key", "col": c, "ref": name, "ref_col": rc}``
      with ``refs[name]`` the referenced DataFrame; NULLs don't violate
      (SQL FK semantics) — violations = rows whose non-null key misses.

    Unknown check kinds raise (strict-spec spirit, like
    pipeline.CorpusPipeline).
    """
    refs = refs or {}
    row_checks = [c for c in checks if c["check"] in _ROW_LEVEL]
    other = [c for c in checks if c["check"] not in _ROW_LEVEL]
    for c in other:
        if c["check"] not in ("unique", "foreign_key"):
            raise ValueError(f"unknown check: {c['check']}")

    out: list[DataFrame] = []
    if row_checks:
        aggs = [F.count(F.lit(1)).cast("long").alias("_total")] + [
            # coalesce: sum over an EMPTY frame is NULL — an empty table
            # has zero violations and PASSES its checks
            F.coalesce(
                F.sum(F.when(_violation_cond(c), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(f"_v{i}")
            for i, c in enumerate(row_checks)
        ]
        one = df.agg(*aggs)  # ONE scan for every row-level check
        # pivot the single aggregate ROW into one output row per check
        # via explode — a union of per-check selects would re-execute
        # the aggregate subtree (one scan per check, the exact failure
        # mode this operator exists to avoid; plan-pinned in tests)
        reports = F.array(
            *[
                F.struct(
                    F.lit(c["check"]).alias("check"),
                    F.lit(_target(c)).alias("target"),
                    F.col(f"_v{i}").alias("violations"),
                    F.col("_total").alias("total"),
                    (F.col(f"_v{i}") == 0).alias("passed"),
                )
                for i, c in enumerate(row_checks)
            ]
        )
        out.append(
            one.select(F.explode(reports).alias("_r")).select("_r.*")
        )
    for c in other:
        if c["check"] == "unique":
            # total rides the same pass: sum of per-key counts == rows
            dup = (
                df.groupBy(*[F.col(x) for x in c["cols"]])
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(
                    F.coalesce(
                        F.sum(
                            F.when(F.col("_n") > 1, F.col("_n") - 1).otherwise(0)
                        ),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("violations"),
                    F.coalesce(F.sum("_n"), F.lit(0))
                    .cast("long")
                    .alias("total"),
                )
            )
            out.append(
                dup.select(
                    F.lit("unique").alias("check"),
                    F.lit(_target(c)).alias("target"),
                    "violations",
                    "total",
                    (F.col("violations") == 0).alias("passed"),
                )
            )
        else:  # foreign_key
            ref = refs[c["ref"]].select(
                F.col(c["ref_col"]).alias(c["col"])
            ).distinct()
            miss = (
                df.filter(F.col(c["col"]).isNotNull())
                .join(ref, c["col"], "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            )
            # the total here is a column-pruned count-only scan — cheap,
            # and only FK checks pay it
            total = df.agg(F.count(F.lit(1)).cast("long").alias("total"))
            out.append(
                miss.crossJoin(total).select(
                    F.lit("foreign_key").alias("check"),
                    F.lit(f"{c['col']}->{c['ref']}.{c['ref_col']}").alias(
                        "target"
                    ),
                    "violations",
                    "total",
                    (F.col("violations") == 0).alias("passed"),
                )
            )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def profile_table(
    df: DataFrame, cols: list[str], p: int = 12
) -> DataFrame:
    """ANALYZE-style column profile: one row per column —
    (col_name, n_rows, n_nulls, min_value, max_value, approx_ndv).

    The optimizer-statistics pass a 100 TB warehouse runs after loads
    (null fractions and NDVs drive join ordering and broadcast
    decisions). Exactly TWO scans regardless of column count:

    1. counts + min/max for EVERY column in one partial-aggregated scan
       (explode-pivoted like ``run_checks``);
    2. NDV registers for EVERY column in one scan — each row emits one
       (col_name, idx, rho) cell per column (the deterministic md5 HLL
       from operators/sketches.py), a single groupBy max builds all
       register tables side by side, ≤ cols × 2^p rows of state.

    min/max render as strings; NUMERIC columns canonicalize through
    DECIMAL(38,6) first so the rendering is engine-portable ('1.000000'
    everywhere) — plain double→string formatting differs across
    engines.
    """
    from .sketches import hll_estimate

    numeric = {"int", "bigint", "smallint", "tinyint", "double", "float",
               "decimal"}

    # integer min/max aggregate on the NATIVE type and canonicalize the
    # one winning value afterwards: int→decimal(38,6) is exact and
    # monotone, so min(cast(x)) == cast(min(x)) — but a decimal(38,6)
    # aggregation buffer is not hash-aggregable (precision > 18 has no
    # mutable UnsafeRow slot), and one such column forced the WHOLE
    # profile scan into a non-codegen SortAggregate
    # (plans/r15/profile_orders_before.txt node 2). float/double keep
    # the in-aggregate cast: cast-to-decimal nulls NaN/Infinity, so
    # pushing it outside would change which value wins on pathological
    # inputs — correctness over the plan there.
    _int_types = {"int", "bigint", "smallint", "tinyint"}

    def _minmax(c: str):
        dt = dict(df.dtypes)[c]
        base = dt.split("(")[0]
        col = F.col(c)
        if base in _int_types:
            return (
                F.min(col).cast("decimal(38,6)").cast("string"),
                F.max(col).cast("decimal(38,6)").cast("string"),
            )
        if base in numeric:
            col = col.cast("decimal(38,6)")
        return F.min(col).cast("string"), F.max(col).cast("string")

    aggs = [F.count(F.lit(1)).cast("long").alias("_total")]
    for i, c in enumerate(cols):
        mn, mx = _minmax(c)
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_n{i}"),
            mn.alias(f"_mn{i}"),
            mx.alias(f"_mx{i}"),
        ]
    one = df.agg(*aggs)
    base_rows = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("_total").alias("n_rows"),
                        F.col(f"_n{i}").alias("n_nulls"),
                        F.col(f"_mn{i}").alias("min_value"),
                        F.col(f"_mx{i}").alias("max_value"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("_r")
    ).select("_r.*")

    m = 1 << p
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.when(
                            F.col(c).isNotNull(),
                            (
                                F.conv(
                                    F.substring(
                                        F.md5(F.col(c).cast("string")), 1, 8
                                    ),
                                    16,
                                    10,
                                ).cast("long")
                                % m
                            ).cast("int"),
                        ).alias("idx"),
                        (
                            F.lit(33)
                            - F.length(
                                F.bin(
                                    F.conv(
                                        F.substring(
                                            F.md5(F.col(c).cast("string")),
                                            9,
                                            8,
                                        ),
                                        16,
                                        10,
                                    ).cast("long")
                                    + 1
                                )
                            )
                        )
                        .cast("int")
                        .alias("_rho"),
                    )
                    for c in cols
                ]
            )
        ).alias("_c")
    ).select("_c.*").filter(F.col("idx").isNotNull())
    regs = cells.groupBy("col_name", "idx").agg(F.max("_rho").alias("rho"))
    ndv = hll_estimate(regs, ["col_name"], p).withColumnRenamed(
        "approx_distinct", "approx_ndv"
    )
    return base_rows.join(F.broadcast(ndv), "col_name", "left").select(
        "col_name",
        "n_rows",
        "n_nulls",
        "min_value",
        "max_value",
        F.coalesce("approx_ndv", F.lit(0)).alias("approx_ndv"),
    )
