"""Reference-semantics relational queries mapped onto the driver's
TPC-H-ish testdata (TESTDATA.md tables).

Each function here exercises a block of SURVEY.md §2 operators — the same
shapes the reference runs over its movies star schema (denormalizing
join+agg, filtered aggregation, incremental predicate, pagination,
icontains search, string_agg round-trips) — expressed Spark-first, with a
DuckDB oracle in registry.py.

Numeric parity with the oracle: money sums are cast per-row to
DECIMAL(18,6) before aggregation. Decimal addition is exact and
order-independent, so Spark's partial-aggregate tree and DuckDB's
sequential sum produce identical values (double sums would differ in the
last ulps and break the value-hash).

Scale notes are inline per query; the common ones:
- dims (region/nation/supplier/part/customer) are broadcast — fact-side
  joins are map-side, no shuffle of the big table;
- aggregates are partial (map-side combine) by construction of
  groupBy().agg();
- per-entity arrays are built by aggregating each bridge independently
  (no cross-product; see operators/denorm.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.tuning import widen
from ..sources.readers import load_table

MONEY = "decimal(18,6)"


def denorm_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: per-order denormalized doc — the movies-ETL shape
    (reference etl/main.py:24-38) on orders/customer/lineitem/part.

    One row per order: customer name, sorted distinct part-name array
    (A2/A3), revenue (A-series agg), line count, and
    ``last_activity = greatest(o_orderdate, max(l_shipdate))`` — the
    change-version stamp (A6, reference etl/main.py:26).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = widen(load_table(spark, sf_dir, "lineitem"))
    part = load_table(spark, sf_dir, "part")

    # Aggregate the lineitem "bridge" independently, then join once per
    # order — no genres×persons-style cross-product (SURVEY §2.3 ⚠).
    per_order = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey, "left")
        .groupBy("l_orderkey")
        .agg(
            F.array_sort(F.collect_set(F.col("p_name"))).alias("part_names"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY)).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
            F.max("l_shipdate").alias("last_ship"),
        )
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left")
        .join(per_order, orders.o_orderkey == per_order.l_orderkey, "left")
        .select(
            F.col("o_orderkey"),
            F.col("c_name"),
            F.col("o_orderstatus"),
            F.coalesce(F.col("part_names"), F.array().cast("array<string>")).alias(
                "part_names"
            ),
            # decimal sum (exact, order-independent) surfaced as double —
            # deterministic nearest-double of the same rational in any engine
            F.coalesce(F.col("revenue"), F.lit(0).cast(MONEY))
            .cast("double")
            .alias("revenue"),
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            F.greatest(F.col("o_orderdate"), F.col("last_ship")).alias("last_activity"),
        )
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped grouped aggregation over the fact table (A1/A7
    family): partial aggregation map-side, 4-6 groups out. The headline
    scan+agg throughput query for bench."""
    lineitem = widen(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
    )
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(MONEY)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(MONEY))
            .cast("double")
            .alias("sum_base_price"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ).cast(MONEY)
            )
            .cast("double")
            .alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped multi-join through the dimension chain
    lineitem→supplier→nation→region (J-family): every dim broadcast, so
    the only shuffle is the final groupBy on n_name (25 groups)."""
    lineitem = widen(load_table(spark, sf_dir, "lineitem"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem.join(
            F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


def incremental_events(
    spark: SparkSession, sf_dir: str, checkpoint: str = "2024-01-15 00:00:00"
) -> DataFrame:
    """Incremental predicate (P3/ST1): strict ``ts > checkpoint`` pushed
    to the parquet scan (reference etl/main.py:35 ``modified > %s``).
    With time-partitioned layout this prunes whole partitions at 100 TB.

    The predicate is applied in the file's NATIVE physical unit
    (readers.load_events_after probes the parquet footer): a timestamp
    comparison for µs files, the raw-int64 ``>= (ckpt_µs+1)·1000`` trick
    for ns files — either way it shows up in PushedFilters
    (tests/test_plans.py).
    """
    import datetime as _dt

    from ..sources.readers import load_events_after

    ckpt_us = int(
        _dt.datetime.fromisoformat(checkpoint)
        .replace(tzinfo=_dt.timezone.utc)
        .timestamp()
        * 1_000_000
    )
    return load_events_after(spark, sf_dir, ckpt_us).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def customer_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered distinct-array aggregation — the API layer's
    ``ArrayAgg('...', distinct=True, filter=Q(role=...))`` shape
    (reference views.py:15-20,43-47; SURVEY A5/P6): per-customer sorted
    distinct order-priority arrays, split by order status."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.array_sort(F.collect_set(F.col("o_orderpriority"))).alias("priorities"),
        F.array_sort(
            F.collect_set(
                F.when(F.col("o_orderstatus") == "F", F.col("o_orderpriority"))
            )
        ).alias("finished_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(
            F.col("c_custkey"),
            F.col("c_name"),
            F.coalesce(F.col("priorities"), F.array().cast("array<string>")).alias(
                "priorities"
            ),
            F.coalesce(
                F.col("finished_priorities"), F.array().cast("array<string>")
            ).alias("finished_priorities"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
    )


def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING_AGG round-trip (A4/F6/F7, reference etl/main.py:42): per-
    nation ', '-joined sorted distinct customer-name string + re-split
    array, preserving the reference's join/split pair exactly."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = customer.groupBy("c_nationkey").agg(
        F.array_sort(F.collect_set(F.col("c_name"))).alias("names_arr")
    )
    return (
        nation.join(agg, nation.n_nationkey == agg.c_nationkey, "left")
        .select(
            F.col("n_nationkey"),
            F.col("n_name"),
            F.concat_ws(", ", F.col("names_arr")).alias("customer_names"),
            # and the reference's .split(', ') round-trip (etl/main.py:101)
            F.coalesce(
                F.when(
                    F.size(F.col("names_arr")) > 0,
                    F.split(F.concat_ws(", ", F.col("names_arr")), ", "),
                ),
                F.array().cast("array<string>"),
            ).alias("names_roundtrip"),
        )
    )


def paginate_orders(
    spark: SparkSession, sf_dir: str, page: int = 3, page_size: int = 50
) -> DataFrame:
    """Offset pagination (O2/O3, reference views.py:49,66): deterministic
    ordering with a unique tiebreak, then offset/limit.

    Scale note: global sort + offset is inherently a single-ordering
    operation; Spark's rangepartition+limit handles it, but deep offsets
    are O(offset) — at scale prefer keyset pagination (WHERE key > last)
    which this engine exposes via paginate_after()."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .offset((page - 1) * page_size)
        .limit(page_size)
    )


def paginate_after(
    spark: SparkSession, sf_dir: str, after_key: int = 0, page_size: int = 50
) -> DataFrame:
    """Keyset pagination — the scale-correct variant of O3: strict
    ``key > last_seen`` + limit; the predicate pushes to the scan, no
    global offset scan."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") > F.lit(after_key))
        .orderBy(F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .limit(page_size)
    )


def icontains_search(
    spark: SparkSession, sf_dir: str, q: str = "red"
) -> DataFrame:
    """Admin/API icontains predicate (P7/P8/F9, reference views.py:92,
    admin.py:21): case-insensitive substring OR across columns."""
    part = load_table(spark, sf_dir, "part")
    ql = q.lower()
    return part.filter(
        F.lower(F.col("p_name")).contains(ql)
        | F.lower(F.col("p_type")).contains(ql)
        | F.lower(F.col("p_brand")).contains(ql)
    ).select("p_partkey", "p_name", "p_brand", "p_type")


def admin_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admin list filters (P9, reference admin.py:18,32): equality facet +
    date-range filter, projected columns."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")


def detail_lookup(spark: SparkSession, sf_dir: str, pk_fragment: str = "42") -> DataFrame:
    """Detail endpoint's odd contains-on-PK semantics (P7, reference
    views.py:92 ``id__icontains=pk``), preserved on the string form of the
    key; first match by key order (reference takes .first())."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey").cast("string").contains(pk_fragment))
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(1)
    )


def count_envelope(spark: SparkSession, sf_dir: str, page_size: int = 50) -> DataFrame:
    """Pagination envelope (A8, reference views.py:66,71-77): COUNT(*) +
    total_pages as a 1-row DataFrame."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.ceil(F.count(F.lit(1)) / F.lit(page_size)).alias("total_pages"),
    )


def supplier_order_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-array aggregation (A2 shape, reference etl/main.py:27-28
    ``json_agg(DISTINCT jsonb_build_object(...))``): per-supplier sorted
    distinct {status, priority} structs from its line items' orders."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    joined = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).select("l_suppkey", "o_orderstatus", "o_orderpriority")
    agg = joined.groupBy("l_suppkey").agg(
        F.array_sort(
            F.collect_set(
                F.struct(
                    F.col("o_orderstatus").alias("status"),
                    F.col("o_orderpriority").alias("priority"),
                )
            )
        ).alias("order_kinds")
    )
    return supplier.join(agg, supplier.s_suppkey == agg.l_suppkey, "left").select(
        "s_suppkey",
        "s_name",
        F.coalesce(
            F.col("order_kinds"),
            F.array().cast("array<struct<status:string,priority:string>>"),
        ).alias("order_kinds"),
    )


def events_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability rollup (A10, reference logs batch counts per tick):
    events per (day, event_type) — partial agg + tiny shuffle."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
        .orderBy("day", "event_type")
    )


def terms_agg_parts(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """ES terms-aggregation analogue (A9/T6, reference ETLTests-2.json:318
    expects 26 genre buckets): bucket counts over the denormalized docs'
    array elements.

    Spark-first: a doc-count per array element == COUNT(DISTINCT doc) per
    joined dimension value, so this computes directly from the base
    tables — no materialize-arrays-then-explode round trip. Identical
    output, one aggregation instead of agg→explode→agg."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_name").alias("part_name"))
        .agg(F.count_distinct(F.col("l_orderkey")).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.col("part_name"))
        .limit(k)
    )


def nested_exists(spark: SparkSession, sf_dir: str, token: str = "red") -> DataFrame:
    """ES nested-query analogue (T4, reference ETLTests-2.json:171 match
    inside the actors array): docs whose part_names array has a matching
    element.

    Scale path: membership in the result is a property of the order's
    line items, so matching order keys are found FIRST (broadcast-join +
    filter + distinct on the fact table — no arrays yet) and only those
    orders are denormalized. Equivalent to building every array and
    filtering with EXISTS, but the aggregation runs on the matching
    subset only."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    matching_keys = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .filter(F.lower(F.col("p_name")).contains(token))
        .select("l_orderkey")
        .distinct()
    )
    li = lineitem.join(matching_keys, "l_orderkey", "left_semi")
    per_order = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set(F.col("p_name"))).alias("part_names"))
    )
    return (
        orders.join(per_order, orders.o_orderkey == per_order.l_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left")
        .select(
            "o_orderkey",
            "c_name",
            F.coalesce(F.col("part_names"), F.array().cast("array<string>")).alias(
                "part_names"
            ),
        )
    )


def user_sessions(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Sessionization of the events stream (gaps-and-islands): a session
    breaks when a user is idle longer than ``gap_minutes``.

    Extension operator (the reference has no window functions — SURVEY
    §2.5; this is the training-pipeline/analytics addition): two window
    functions over ONE partitioning — lag(ts) flags session starts, a
    running sum of flags numbers them — so the whole query is a single
    shuffle on user_id, then an ordinary grouped aggregation. At 100 TB
    the user_id partitioning bounds per-task state to one user's events;
    skewed power-users are split by AQE.

    Output: (user_id, session_id, session_start, session_end, n_events).
    Deterministic: window ordered by (ts, event_id) — unique tiebreak.
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer µs arithmetic — identical in any engine (no float
    # epoch, no truncation ambiguity)
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(w)
            > gap_minutes * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session").over(w).cast("long").alias("session_id"),
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


def user_sessions_sliced(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
    slice_unit: str = "day",
) -> DataFrame:
    """Skew-safe sessionization — value-identical to ``user_sessions``
    (same oracle) but no unsplittable per-user window over raw events.

    An ordered window is inherently one-task-per-key (AQE cannot split
    it), so a power user with 10⁹ events turns the plain gaps-and-
    islands into an hours-long straggler. Two passes fix the shape:

    1. sessionize within (user, day) slices — partitions are bounded by
       a key's events per day, not its lifetime;
    2. gaps-and-islands AGAIN over the per-slice session summaries
       (one row per session — smaller than events by the mean session
       size), merging sessions whose boundary gap ≤ the idle gap.

    Equivalence: a session is a maximal event chain with inter-event
    gaps ≤ G. Pass 1 can only split such a chain at slice boundaries,
    and the boundary gap between the resulting sub-sessions is exactly
    the inter-event gap there, so pass 2 re-merges precisely the splits
    pass 1 introduced — pinned by sharing user_sessions' oracle AND by
    tests/test_temporal.py boundary cases. For keys pathological even
    per-day, pass ``slice_unit="hour"`` (any date_trunc unit works —
    the equivalence argument is boundary-agnostic).
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    gap_us = gap_minutes * 60 * 1_000_000
    w1 = Window.partitionBy("user_id", "_slice").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.date_trunc(slice_unit, F.col("ts")).alias("_slice"),
    ).select(
        "user_id",
        "ts",
        "_slice",
        "event_id",
        F.when(
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(w1)
            > gap_us,
            1,
        )
        .otherwise(0)
        .alias("_new"),
    )
    per_slice = (
        flagged.select(
            "user_id",
            "ts",
            "_slice",
            F.sum("_new").over(w1).cast("long").alias("_sid"),
        )
        .groupBy("user_id", "_slice", "_sid")
        .agg(
            F.min("ts").alias("_start"),
            F.max("ts").alias("_end"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    # pass 2: islands over SESSIONS (starts are distinct per user, so the
    # ordering is total without a tiebreak)
    w2 = Window.partitionBy("user_id").orderBy("_start")
    merged = per_slice.select(
        "user_id",
        "_start",
        "_end",
        "_n",
        F.when(
            F.unix_micros(F.col("_start"))
            - F.lag(F.unix_micros(F.col("_end"))).over(w2)
            > gap_us,
            1,
        )
        .otherwise(0)
        .alias("_new2"),
    ).select(
        "user_id",
        "_start",
        "_end",
        "_n",
        F.sum("_new2").over(w2).cast("long").alias("session_id"),
    )
    return (
        merged.groupBy("user_id", "session_id")
        .agg(
            F.min("_start").alias("session_start"),
            F.max("_end").alias("session_end"),
            F.sum("_n").alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


def top_parts_per_nation(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Top-k per group (window rank): the k highest-revenue parts per
    supplier nation. Extension operator (no window functions in the
    reference — SURVEY §2.5).

    Shape: broadcast dim joins → one (nation, part) aggregation → window
    row_number over the nation partitioning → rank filter. The window
    runs on the AGGREGATED frame (|nations|×|parts| rows at most), never
    on the fact table; ordering has a unique (revenue desc, part) key so
    the rank is total and engine-portable.
    """
    from pyspark.sql import Window

    lineitem = widen(load_table(spark, sf_dir, "lineitem"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    per = (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("n_name", "p_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY))
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.col("p_name"))
    return (
        per.select("n_name", "p_name", "revenue", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= k)
        .orderBy("n_name", "rnk")
    )


def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95/p99 of event value per type — the latency-style
    distribution rollup. Exact `percentile` (interpolating, identical to
    DuckDB's quantile_cont on the same data) — sorts within each group.
    At 100 TB switch to `approx_percentile` (t-digest sketch, one pass,
    mergeable partials) and accept the documented error bound; the exact
    form is the oracle for that swap.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical revenue totals via ROLLUP(region, nation): per-nation
    rows, per-region subtotals, and the grand total in ONE aggregation
    pass (Catalyst expands the grouping sets; partial aggregation still
    applies). grouping_id disambiguates rolled-up NULLs from natural
    NULLs — the standard cube/rollup analytics shape the reference's
    admin would hand-compute with three queries."""
    lineitem = widen(load_table(spark, sf_dir, "lineitem"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
            F.grouping_id().alias("gid"),
        )
    )


def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts pivoted to one column per status (O/F/P) per
    priority — the admin dashboard crosstab. The status domain is pinned
    (TPC-H statuses), so the pivot compiles to one pass of conditional
    aggregates — no two-phase distinct-value discovery job."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
            F.coalesce(F.col("F"), F.lit(0)).alias("n_finished"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
        )
    )


def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull `k` out of the events.props JSON
    string (get_json_object — JVM-side JSON path, no UDF) and roll up
    per event type. avg is emitted as exact-integer sum / count in
    double — division of identical integers is bit-identical in any
    engine (no accumulation-order sensitivity)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def user_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-value totals bucketed into quartiles — the
    cohort-bucketing shape, via two-pass quantile cut-points:
    pass 1 computes the p75/p50/p25 cut values of the per-user totals
    (one 3-number row), pass 2 assigns quartile = 1 + #cuts above the
    user's total through a broadcast of that row — entirely map-side.

    This replaces the previous global ``ntile(4)`` window (an
    unpartitioned Window.orderBy forces every per-user row through ONE
    task — a straggler at 100 TB); value-cut bucketing is the
    scale-correct cohort semantics (equal-value users always share a
    quartile). Exact `percentile` keeps the oracle bit-exact; at 100 TB
    swap to `approx_percentile` (t-digest, mergeable partials) the same
    way event_value_percentiles documents its approx swap."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    cuts = per_user.agg(
        F.expr("percentile(total_value, array(0.75, 0.5, 0.25))").alias("_cuts")
    )
    tv = F.col("total_value")
    quartile = (
        F.lit(1)
        + (tv < F.col("_cuts")[0]).cast("int")
        + (tv < F.col("_cuts")[1]).cast("int")
        + (tv < F.col("_cuts")[2]).cast("int")
    )
    return (
        per_user.crossJoin(F.broadcast(cuts))
        .select(
            "user_id",
            F.round("total_value", 6).alias("total_value"),
            "n_events",
            quartile.alias("quartile"),
        )
        .orderBy("quartile", F.desc("total_value"), "user_id")
    )


def skew_safe_distinct_users(
    spark: SparkSession,
    sf_dir: str,
    n_salts: int = 32,
    events: DataFrame | None = None,
) -> DataFrame:
    """COUNT(DISTINCT user_id) per event_type, salted two-stage — the
    skew-safe shape for exact distinct counts under a low-cardinality /
    hot-key GROUP BY.

    A plain `groupBy(type).agg(countDistinct(user))` shuffles EVERY
    (type, user) pair to |types| reducers — at 100 TB a hot event type
    is one straggler task holding the whole key's dedup set. Salting
    fixes the partition math without approximation: stage 1 groups by
    (type, salt) where salt = pmod(hash(user), n_salts) — the SAME user
    always lands in the SAME salt bucket, so per-bucket distinct counts
    partition the user set and stage 2's plain SUM over n_salts rows
    per type is exact. Parallelism is |types| × n_salts regardless of
    skew; n_salts sizes to the cluster, not the data.

    (Spark's own distinct-agg rewrite expands on the distinct column —
    similar effect; this operator pins the pattern explicitly so the
    plan is salt-partitioned by construction, the form that also
    composes with multi-distinct and approx sketches.)
    """
    if events is None:
        events = load_table(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64(F.col("user_id")), F.lit(n_salts))
    partial = (
        events.select("event_type", "user_id", salt.alias("_salt"))
        .groupBy("event_type", "_salt")
        .agg(F.count_distinct(F.col("user_id")).alias("_part"))
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum("_part").alias("distinct_users"))
        .orderBy("event_type")
    )


def event_funnel(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    events: DataFrame | None = None,
) -> DataFrame:
    """Ordered funnel analysis over the events stream: how many users
    reach step k of ``steps``, where a user reaches step k iff their
    event history contains the step event types IN ORDER (each step's
    event strictly after the previous step's matching event, ordered by
    (ts, event_id) — unique tiebreak).

    Extension operator (reference has no window/sequence analytics —
    SURVEY §2.5); the classic product-analytics "conversion funnel".

    Scale design — ONE shuffle of the (pre-filtered) events:
    - events are filtered to the step types at the scan (predicate
      pushed down, non-funnel types never leave the parquet reader);
    - one groupBy(user_id) collects each user's step-typed events as a
      sorted array, and a native ``F.aggregate`` fold walks the array
      once, advancing a step counter on each in-order match. Per-task
      state is one user's step-typed events — bounded, and orders of
      magnitude smaller than their full history;
    - the per-user max-step then explodes to (step, user) rows and a
      tiny groupBy(step) count finishes; the step-dimension join is a
      broadcast of len(steps) literal rows, so no sort-merge join
      appears anywhere in the plan (pinned by tests/test_plans.py).

    Equivalence to the cascade form (min-seq per step with seq >
    previous step's seq — the DuckDB oracle): the fold advances at the
    FIRST qualifying event after the previous advance, which is exactly
    the min over later events; induction over steps gives identical
    reach sets.

    Output: (step int, step_name, n_users) — one row per step, zero
    counts preserved.
    """
    if events is None:
        events = load_table(spark, sf_dir, "events")
    step_arr = F.array(*[F.lit(s) for s in steps])
    per_user = (
        events.where(F.col("event_type").isin(list(steps)))
        .select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
    )
    k = len(steps)
    progress = F.aggregate(
        "evs",
        F.lit(0),
        lambda acc, e: F.when(
            (acc < k) & (e["event_type"] == F.get(step_arr, acc)), acc + 1
        ).otherwise(acc),
    )
    reached = (
        per_user.select(progress.alias("progress"))
        .where(F.col("progress") >= 1)
        # sequence(1, 0) would DESCEND in Spark — the >= 1 filter above
        # is load-bearing, not cosmetic
        .select(
            F.explode(F.sequence(F.lit(1), F.col("progress"))).alias("step")
        )
    )
    counts = reached.groupBy("step").agg(F.count(F.lit(1)).alias("n_users"))
    step_dim = (
        spark.range(1)
        .select(F.posexplode(step_arr).alias("pos", "step_name"))
        .select((F.col("pos") + 1).cast("int").alias("step"), "step_name")
    )
    return (
        step_dim.join(counts, "step", "left")
        .select(
            "step",
            "step_name",
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
        )
        .orderBy("step")
    )


def cohort_retention(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Weekly cohort-retention matrix: users are cohorted by the ISO
    week (Monday-truncated) of their FIRST event; for every
    (cohort_week, week_offset) the count of distinct cohort members
    active that week.

    Extension operator (product-analytics retention triangle). Scale
    design: the user→cohort frame is one groupBy(user_id) min — per-key
    constant state, partial-aggregated. Joining it back to events is an
    equi-join on user_id: the cohort side is one row per user (≪
    events), and the join key equals the preceding agg's partitioning,
    so no extra shuffle of the fact side beyond the one the distinct
    needs. The (cohort, offset, user) dedup before counting is itself a
    partial-agg groupBy — no countDistinct single-reducer, skew absorbed
    by AQE.

    week_offset is exact integer arithmetic: floor(datediff(day) / 7) on
    date types — identical in any engine, no float epoch.

    Output: (cohort_week date, week_offset int, n_users) ordered by
    (cohort_week, week_offset). Offset 0 always contains the cohort's
    full size (a user is active in the week of their first event).
    """
    if events is None:
        events = load_table(spark, sf_dir, "events")
    events = events.select("user_id", "ts")
    cohort = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            "user_id",
            F.to_date(F.date_trunc("week", F.col("first_ts"))).alias(
                "cohort_week"
            ),
        )
    )
    active = (
        events.join(cohort, "user_id")
        .select(
            "cohort_week",
            "user_id",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped unshipped-revenue top-k (adapted: this testdata
    carries no o_shippriority column): for one market segment, the 10
    orders placed before the cutoff with the highest revenue from items
    shipping after it. Plan: customer filter broadcasts into orders,
    that join broadcasts into lineitem's scan-stage date filter, partial
    agg on l_orderkey, TakeOrderedAndProject top-10 — the fact is
    scanned once and shuffled only by the 10-ish surviving groups'
    aggregation."""
    cutoff = "1997-01-01"
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = widen(load_table(spark, sf_dir, "lineitem")).filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    return (
        li.join(
            F.broadcast(
                orders.join(
                    F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey,
                ).select("o_orderkey", "o_orderdate")
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    MONEY
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: top-20 customers by
    revenue of 'R'-flagged items on orders from one quarter, with their
    nation. Dims broadcast; one partial-agged shuffle on c_custkey."""
    lo, hi = "1996-01-01", "1996-04-01"
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    )
    li = widen(load_table(spark, sf_dir, "lineitem")).filter(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    MONEY
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
