"""Physical-plan regression tests: the properties that decide whether a
query survives a 100× scale-up — dimension joins stay broadcast, filters
reach the parquet scan, column pruning holds, time-partitioned layouts
prune partitions — pinned against `.explain` output.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark import registry
from djangoadmin_postgresql_2_elasticseach_spark.plans.tuning import (
    assert_broadcast_join,
    plan_string,
)
from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_table
from djangoadmin_postgresql_2_elasticseach_spark.sources.writers import write_partitioned
from tests.conftest import SF_SMOKE


def test_dimension_joins_broadcast(spark):
    """Every dim join in the multi-join chain must be a broadcast — a
    sort-merge here would shuffle the fact table three times."""
    df = registry.QUERIES["revenue_by_nation"](spark, SF_SMOKE)
    assert_broadcast_join(df, min_broadcasts=3)


def test_denorm_orders_broadcasts_dims(spark):
    df = registry.QUERIES["denorm_orders"](spark, SF_SMOKE)
    assert_broadcast_join(df, min_broadcasts=2)  # part + customer


def test_incremental_filter_pushed_to_scan(spark):
    """The ts > ckpt predicate must appear in PushedFilters — that is
    what makes the incremental scan prune row groups/partitions."""
    df = registry.QUERIES["incremental_events"](spark, SF_SMOKE)
    plan = plan_string(df)
    assert "PushedFilters" in plan
    # predicate applies to the raw ns column so it reaches the scan
    assert "GreaterThanOrEqual(ts" in plan, plan[:1500]


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must not read the full lineitem schema."""
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_string(li)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan, plan[-800:]


def test_admin_filter_pushdown(spark):
    df = registry.QUERIES["admin_list_filter"](spark, SF_SMOKE)
    plan = plan_string(df)
    assert "EqualTo(o_orderstatus,F)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_write_partitioned_prunes(spark, tmp_path):
    """Time-partitioned layout + a modified>ckpt filter ⇒ the scan lists
    only matching partition directories (PartitionFilters present)."""
    events = load_table(spark, SF_SMOKE, "events").withColumnRenamed("ts", "modified")
    path = str(tmp_path / "events_parted")
    write_partitioned(events, path, ts_col="modified", granularity="date")
    # one directory per day
    days = [d for d in os.listdir(path) if d.startswith("p_bucket=")]
    assert len(days) == 30
    back = spark.read.parquet(path).filter(F.col("p_bucket") > "2024-01-15")
    plan = plan_string(back)
    assert "PartitionFilters" in plan
    assert plan.count("2024-01-15") >= 1
    # pruned read touches only the matching files
    assert back.select("event_id").count() == (
        spark.read.parquet(path)
        .filter(F.col("modified") >= "2024-01-16")
        .count()
    )


def test_topk_uses_take_ordered(spark):
    """Global top-k must compile to TakeOrderedAndProject, not a full
    sort of N rows."""
    df = registry.QUERIES["ann_brute_topk"](spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_agg_is_partial_then_final(spark):
    """Aggregation must be partial (map-side combine) before the
    exchange — only the per-partition partials shuffle, not rows."""
    df = registry.QUERIES["pricing_summary"](spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange hashpartitioning"), (
        "partial agg must sit below the shuffle"
    )


def test_whole_stage_codegen_on_agg(spark):
    """The pricing aggregation's scan+partial-agg must live inside a
    WholeStageCodegen span (JVM-compiled, no interpreter rows). AQE off
    for the assertion — its wrapper hides codegen annotation pre-run."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = registry.QUERIES["pricing_summary"](spark, SF_SMOKE)
        plan = plan_string(df, mode="simple")
        # codegen'd operators carry the `*(stage)` marker
        import re

        assert re.search(r"\*\(\d+\) HashAggregate", plan), plan[:1500]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bm25_topk_plan(spark):
    """BM25 must compile to TakeOrderedAndProject (no global sort) and a
    single broadcast of the 1-row stats frame (no shuffle join)."""
    df = registry.QUERIES["bm25_topk"](spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Tables bucketed on the join key must join with ZERO Exchange —
    the co-located-join contract write_bucketed exists for."""
    from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_table
    from djangoadmin_postgresql_2_elasticseach_spark.sources.writers import write_bucketed

    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders.select("o_orderkey", "o_orderstatus"), "t_orders_b", "o_orderkey", 8)
    write_bucketed(lineitem.select("l_orderkey", "l_quantity"), "t_lineitem_b", "l_orderkey", 8)
    # disable auto-broadcast so the join strategy is the one the layout
    # exists for at scale (both sides too big to broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey).groupBy("o_orderstatus").count()
        plan = plan_string(joined, mode="simple")
        assert "SortMergeJoin" in plan, plan[:2000]
        # the JOIN itself must not shuffle; the only allowed Exchange is
        # the final tiny groupBy ABOVE it. Below the SortMergeJoin the
        # bucketed scans feed sorts directly — zero Exchange.
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part, plan[:2000]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_topk_per_group_broadcasts_dims(spark):
    """The window rank must run on the aggregated frame with all three
    dims broadcast — the fact table is never shuffled for a dim join."""
    from djangoadmin_postgresql_2_elasticseach_spark.plans.tuning import assert_broadcast_join

    df = registry.QUERIES["top_parts_per_nation"](spark, SF_SMOKE)
    assert_broadcast_join(df, min_broadcasts=3)
    plan = plan_string(df, mode="simple")
    assert "Window" in plan


def test_range_join_is_equi_not_nested_loop(spark):
    """The bucketized range join must compile to an equi-join (sort-merge
    or hash) — a BroadcastNestedLoopJoin means the inequality leaked into
    the join condition and the operator is quadratic again."""
    df = registry.QUERIES["range_purchase_windows"](spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_asof_join_single_key_window(spark):
    """The as-of join is one key-partitioned window — no join operator at
    all in the plan (the union-merge shape), and the window partitioning
    is by the key, never global."""
    df = registry.QUERIES["asof_last_purchase"](spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the enrich path has no equi-join either: union + window only
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "windowspecdefinition(user_id" in plan, plan[:2000]


def test_source_quota_window_is_partitioned(spark):
    """Domain balancing must never degrade to a global window — the
    row_number partitioning by source is the scale guarantee."""
    df = registry.QUERIES["source_quota"](spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "windowspecdefinition(source" in plan, plan[:2000]


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The benchmark shingle set is the small side by construction; the
    corpus scan must join against it broadcast, never shuffle itself."""
    df = registry.QUERIES["decontaminate"](spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_minhash_band_join_never_broadcasts_band_frame(spark):
    """The LSH band self-join must stay a shuffle equi-join in the LOGIC:
    no broadcast HINT on the band frame (ResolvedHint in the analyzed
    plan). Catalyst may still pick broadcast from tiny local statistics —
    the guard is that WE never force it."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    analyzed = (
        minhash_lsh_candidates(docs)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "UnresolvedHint" not in analyzed
    assert "ResolvedHint (strategy=broadcast)" not in analyzed, analyzed[:2000]


def test_corpus_queries_prune_document_columns(spark):
    """Document-table queries must push column pruning to the scan — a
    corpus scan that reads all columns for a 3-column operator drags the
    full text+metadata width through the shuffle at 100 TB."""
    df = registry.QUERIES["source_quota"](spark, SF_SMOKE)
    plan = plan_string(df)
    m = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert m, plan[:1000]
    schema_line = m[0]
    assert "doc_id" in schema_line and "source" in schema_line
    assert "n_chars" not in schema_line and "lang" not in schema_line


def test_persisted_ivf_index_prunes_partitions(spark, tmp_path):
    """The stored IVF index must answer a query from the probed bucket
    PARTITIONS only: PartitionFilters carries the bucket predicate (no
    full-index scan), and results equal the on-the-fly ivf_topk."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import (
        build_ivf_index,
        ivf_query_indexed,
        ivf_topk,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.plans.tuning import plan_string
    from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "ivf_index")
    planes = build_ivf_index(emb, path, n_planes=4)
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]

    got = ivf_query_indexed(spark, path, qvec, planes, k=10)
    plan = plan_string(got)
    # the bucket predicate must reach the partition-pruning layer
    assert "PartitionFilters" in plan
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "bucket" in pf_line, pf_line
    # parity with the on-the-fly path (same planes, same probes)
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(emb, qvec, k=10, n_planes=4, probe_hamming=1).collect()
    ]
    have = [(r["vec_id"], r["cos_sim"]) for r in got.collect()]
    assert have == want


def test_knn_join_rank_limit_pushdown(spark):
    """The kNN join's top-k must run as a rank-limit window
    (WindowGroupLimit — each map task emits ≤k rows per query before
    the exchange, so post-shuffle state is |L|·k, never |L|·|R|) with
    the query batch on the broadcast side."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import knn_join
    from djangoadmin_postgresql_2_elasticseach_spark.plans.tuning import plan_string

    emb = load_table(spark, SF_SMOKE, "embeddings")
    df = knn_join(emb.filter("vec_id < 5"), emb, k=5, exclude_self=True)
    plan = plan_string(df)
    assert "WindowGroupLimit" in plan, plan
    assert "Broadcast" in plan, plan


def test_stemmer_expression_weight_bounded():
    """Plan-weight regression guard (r4 verdict): the Snowball chain's
    deterministic SQL emission is a faithful proxy for the Column tree
    (both backends emit from the same stage functions). r5 measured
    ~139 KB; fail if it ever doubles — Catalyst analysis/codegen cost of
    the analyzer is a per-job constant only while the tree stays flat."""
    from djangoadmin_postgresql_2_elasticseach_spark.functions import text as T

    assert len(T.stem_sql("arr")) < 280_000


def test_analyzer_queries_read_persisted_index(spark):
    """analyze_tokens/inverted_df must serve from the persisted
    index-time artifact (search/index.analyzed_corpus_cached) — the plan
    reading the tokens parquet, NOT re-running the analyzer chain over
    document bodies per query (no regexp in the optimized plan)."""
    for name in ("analyze_tokens", "inverted_df"):
        df = registry.QUERIES[name](spark, SF_SMOKE)
        plan = plan_string(df)
        scan_lines = [ln for ln in plan.splitlines() if "Scan parquet" in ln]
        assert scan_lines, plan[:1500]
        assert "regexp_replace" not in plan, f"{name} re-derives tokens"


def test_pack_sequences_no_global_window_over_corpus(spark):
    """The packing prefix sum must never drag the corpus to one task:
    the doc-side Window partitions on the order-key bucket, and the only
    single-partition Window in the plan is the 256-row bucket-totals
    frame (fed by its own aggregation, not the raw scan)."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import pack_sequences

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = plan_string(pack_sequences(docs), mode="simple")
    # the per-doc cumulative sum runs under hash partitioning on _bucket
    assert "hashpartitioning(_bucket" in plan, plan[:2000]
    # exactly one SinglePartition exchange (the |buckets|-row base-offset
    # frame), and it sits downstream of a HashAggregate, never the scan
    assert plan.count("SinglePartition") == 1, plan[:3000]
    single_ix = plan.index("SinglePartition")
    assert "HashAggregate" in plan[single_ix:], plan[single_ix:single_ix + 1500]


def test_resample_ffill_windows_are_key_partitioned(spark):
    """The gap-fill's cumulative window must run under the user_id
    partitioning — an unpartitioned Window here drags every grid row
    through one task at scale."""
    df = registry.QUERIES["resample_daily_ffill"](spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "Window" in plan
    # no single-partition exchange feeding a Window over the grid
    for ln in plan.splitlines():
        if "Window" in ln and "windowspecdefinition" in ln:
            assert "user_id" in ln, ln
    assert "SinglePartition" not in plan, plan[:3000]


def test_hybrid_rrf_branches_are_topk_not_sort(spark):
    """Both retrieval branches must compile to TakeOrderedAndProject
    (global top-k) — a full Sort of the scored corpus would shuffle
    everything at 100 TB. The fusion join operates on two <=k frames."""
    df = registry.QUERIES["hybrid_search_rrf"](spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert plan.count("TakeOrderedAndProject") >= 2, plan[:3000]


def test_event_funnel_single_shuffle_no_smj(spark):
    """The funnel must be ONE exchange of the (pre-filtered) events — a
    fold over per-user sorted arrays — plus a tiny broadcast of the step
    dimension. A SortMergeJoin or a per-step cascade of event joins
    would shuffle the fact table len(steps) times."""
    df = registry.QUERIES["event_funnel"](spark, SF_SMOKE)
    plan = plan_string(df)
    assert "SortMergeJoin" not in plan, plan[-1500:]
    # the step-type filter reaches the parquet scan: non-funnel event
    # types never leave the reader
    assert "In(event_type" in plan, plan[:2000]


def test_cohort_retention_filter_and_agg_shape(spark):
    """Cohort build is a partial-agg min per user; no countDistinct
    single-reducer anywhere (the dedup is a grouped distinct)."""
    df = registry.QUERIES["cohort_retention"](spark, SF_SMOKE)
    plan = plan_string(df)
    assert "partial_min" in plan or "HashAggregate" in plan
    # the intended property, asserted directly (ADVICE r5: the old
    # disjunct was dead — grouped dedup always shows "distinct"): no
    # count(distinct ...) aggregate anywhere in the physical plan
    assert "count(distinct" not in plan.lower(), (
        "countDistinct aggregate found where a grouped dedup was intended"
    )


def test_kmv_sketch_rank_limit_pushdown(spark):
    """The bottom-k sketch's row_number()<=k must compile to a PARTIAL
    WindowGroupLimit below the exchange: every map task retains only k
    hashes per group, so sketch state is O(groups·k) end-to-end, never
    the distinct count (the property that makes the sketch usable at
    10^9 distincts per group)."""
    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import kmv_sketch
    from djangoadmin_postgresql_2_elasticseach_spark.plans.tuning import plan_string

    df = spark.range(10_000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.col("id").alias("uid"),
    )
    plan = plan_string(kmv_sketch(df, "uid", ["g"], k=64))
    assert "WindowGroupLimit" in plan, plan
    # partial (pre-shuffle) instance present, not just the final one
    assert "Partial" in plan.split("Exchange", 1)[-1], plan


def test_admin_save_never_shuffles_the_table(spark):
    """The admin form-save merge must stay all-broadcast: the edit
    batch is form-sized, so a shuffle of the entity table (SortMergeJoin
    or a hashpartitioning Exchange) would mean the merge re-partitions
    100 TB to apply a 10-row edit."""
    df = registry.QUERIES["admin_save_docs"](spark, SF_SMOKE)
    plan = plan_string(df)
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # update + semi + anti


def test_persisted_ivfpq_index_prunes_partitions(spark, tmp_path):
    """The stored IVF-PQ index (id, bucket, codes — float-free) must
    answer from the probed bucket PARTITIONS only, and match the
    one-pass ivf_pq_topk over the raw float table."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import (
        build_ivfpq_index,
        ivf_pq_topk,
        ivfpq_query_indexed,
        pq_codebooks_deterministic,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.plans.tuning import plan_string
    from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = pq_codebooks_deterministic(emb, m=4, ksub=16)
    path = str(tmp_path / "ivfpq_index")
    planes = build_ivfpq_index(emb, path, books, n_planes=4)
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]

    got = ivfpq_query_indexed(spark, path, books, qvec, planes, k=10)
    plan = plan_string(got)
    assert "PartitionFilters" in plan
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "bucket" in pf_line, pf_line
    # the code-only read never touches a float embedding column
    assert "embedding" not in plan
    want = [
        (r["vec_id"], r["approx_dist"])
        for r in ivf_pq_topk(emb, books, qvec, k=10).collect()
    ]
    have = [(r["vec_id"], r["approx_dist"]) for r in got.collect()]
    assert have == want


def test_quality_classifier_scores_minimal_scans(spark):
    """The NB quality scorer must read its backing table exactly three
    times (two seeds + corpus — no duplicate seed-count evaluation, no
    second corpus scan for assembly), join the llr table by broadcast,
    and never sort-merge join."""
    from djangoadmin_postgresql_2_elasticseach_spark import registry

    df = registry.QUERIES["quality_classifier"](spark, SF_SMOKE)
    plan = plan_string(df)
    assert plan.count("documents.parquet") == 3, plan.count("documents.parquet")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_importance_resample_plan_shape(spark):
    """DSIR selection must (a) BROADCAST the llr table into the scoring
    join — the corpus side never shuffles to meet it — and (b) select
    the top-n via TakeOrderedAndProject, never a global Sort."""
    df = registry.QUERIES["importance_resample_docs"](spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_key_skew_and_vocab_head_is_top_n(spark):
    """The skew/vocab heads are per-partition top-N merges — a global
    Sort of the full key/vocab domain would be the 100 TB failure."""
    for name in ("key_skew_events", "vocab_coverage_top"):
        plan = plan_string(registry.QUERIES[name](spark, SF_SMOKE), mode="simple")
        assert "TakeOrderedAndProject" in plan, name


def test_snapshot_diff_is_one_full_outer_join(spark):
    """Churn diff = exactly ONE full-outer join of the two snapshots;
    no broadcast attempted (both sides are table-sized by contract)."""
    df = registry.QUERIES["snapshot_diff_orders"](spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert plan.count("FullOuter") == 1


def test_weighted_sample_stratified_uses_window_group_limit(spark):
    """Per-stratum top-n compiles to WindowGroupLimit (rank cap pushed
    below the exchange — each map task forwards ≤ n rows per stratum),
    and the global form is TakeOrderedAndProject."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        weighted_sample,
    )

    docs = registry.load_table(spark, SF_SMOKE, "documents")
    strat = weighted_sample(
        docs, n=5, weight_col="n_chars", strata=["source"]
    )
    assert "WindowGroupLimit" in plan_string(strat, mode="simple")
    glob = weighted_sample(docs, n=5, weight_col="n_chars")
    assert "TakeOrderedAndProject" in plan_string(glob, mode="simple")


def test_mmr_ivfpq_composition_prunes_partitions(spark):
    """The IVF-PQ→MMR registry query must feed the greedy from the
    PERSISTED index via partition-pruned probe reads: the shortlist
    subtree reads only the probed bucket directories (PartitionFilters
    on `bucket`), while the float table is read only for the bounded
    exact-cosine re-rank + pairwise matrix — never ADC-scanned."""
    df = registry.QUERIES["mmr_ivfpq_topk"](spark, SF_SMOKE)
    plan = plan_string(df)
    assert "PartitionFilters" in plan
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "bucket" in pf_line, pf_line
