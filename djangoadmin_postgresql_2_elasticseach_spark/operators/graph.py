"""Graph analytics over edge DataFrames — triangle counting and
PageRank, the two classic "does your engine do graphs" operators.

Extension operators (the reference has no graph surface; near-dup
clustering in operators/dedup.py already provides connected
components). Graphs here are plain DataFrames of (src, dst) edges —
no graph framework, exactly how a 100 TB edge list actually lives in a
lake.

Triangle counting uses the degree-ordered orientation (Suri &
Vassilvitskii 2011, "Counting triangles and the curse of the last
reducer"): orient each undirected edge from the lower-(degree, id)
endpoint to the higher one, generate wedges only from OUT-neighbor
pairs, and probe the oriented edge set for the closing edge. A raw
wedge join explodes on hub nodes (a k-degree node contributes k² pairs
— the "last reducer" that never finishes); orientation caps every
node's out-degree at O(sqrt(|E|)), so wedge volume is bounded by
Σ out_deg² ≤ |E|^1.5 regardless of skew. Each triangle is counted
EXACTLY once (its middle vertex in the total order owns it).

PageRank is the iterative representative: per iteration one
contribution shuffle + one aggregate, lineage truncated per round with
the same eager-localCheckpoint + free pattern as dedup_clusters
(SCALING.md block-hygiene rule). Dangling mass is redistributed
uniformly so ranks sum to N every iteration (the standard closed form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from ..session import local_checkpoint_scoped, persist_scoped
from pyspark.sql import functions as F


def undirected_edges(
    df: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Canonical undirected edge set: (a, b) with a < b, self-loops
    dropped, duplicates collapsed."""
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    return (
        df.filter(F.col(src) != F.col(dst)).select(a, b).distinct()
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """ONE-ROW frame: (n_triangles). ``edges`` may be directed/noisy —
    it is canonicalized first.

    Shape: degree computation (one agg), orientation (two broadcast-or-
    shuffle joins against the ≤|V|-row degree table), wedge self-join on
    the oriented head, closing-edge semi-probe. No node ever fans out
    more than its out-degree ≤ O(sqrt(|E|)) wedges.
    """
    # the canonical edge set is referenced FOUR times below (degree agg
    # ×2, orientation join, closing probe); if `edges` is itself an
    # expensive derivation (e.g. a co-occurrence self-join), the lazy
    # form re-executes it per reference — materialize once, bounded by
    # |E| (measured 5.4→3.5 s on the sf0.1 co-occurrence query);
    # previous invocation's blocks freed on the next call
    # (session.local_checkpoint_scoped)
    e = local_checkpoint_scoped(
        undirected_edges(edges, src, dst), "graph.triangle_edges"
    )
    # persist: deg broadcasts into BOTH orientation joins (a- and
    # b-side) and each BroadcastExchange rebuilds the union+agg over
    # the edge checkpoint; oriented likewise feeds both wedge-join
    # sides under broadcast boundaries where exchange reuse cannot
    # fire (plans/r15/triangle_part_pairs_before.txt carries the
    # degree agg four times). Both frames are slim and edge-bounded —
    # deg ≤ |V| rows, oriented = |E| rows; previous invocation's
    # CacheManager entries released on the next call
    # (session.persist_scoped — persist() is never ContextCleaner-reclaimed).
    deg = persist_scoped(
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d")),
        "graph.triangle_deg",
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    withd = e.join(da, "a").join(db, "b")
    # orient lower (degree, id) → higher
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = persist_scoped(
        withd.select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        ),
        "graph.triangle_oriented",
    )
    o2 = oriented.select(F.col("u"), F.col("w").alias("w2"))
    # id-ordered out-neighbor pairs: exactly one wedge per triangle (its
    # minimum vertex in the degree order owns both out-edges)
    wedges = oriented.join(o2, "u").filter(F.col("w") < F.col("w2"))
    # closing-edge probe against the CANONICAL id-ordered edge set —
    # a pure equi-join (an orientation-agnostic OR condition here would
    # plan as a nested-loop join)
    tri = wedges.join(
        e.select(F.col("a").alias("w"), F.col("b").alias("w2")),
        ["w", "w2"],
        "left_semi",
    )
    return tri.groupBy().agg(F.count(F.lit(1)).alias("n_triangles"))


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a DIRECTED edge list: (v, rank), ranks summing to
    |V| (the per-node-mean-1 convention). Dangling nodes' mass is
    redistributed uniformly each iteration.

    Per iteration: one (src-keyed) contribution shuffle + one dst
    aggregate + a one-row dangling-mass broadcast; lineage truncated
    with eager localCheckpoint and superseded blocks freed immediately
    (session.free_local_checkpoint — the dedup_clusters hygiene rule).
    """
    from ..session import free_local_checkpoint

    nodes = (
        edges.select(F.col(src).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    out_deg = edges.groupBy(F.col(src).alias("v")).agg(
        F.count(F.lit(1)).alias("outd")
    )
    ranks = nodes.select("v", F.lit(1.0).alias("rank")).localCheckpoint(
        eager=True
    )
    owned = ranks
    for _ in range(iters):
        with_deg = ranks.join(out_deg, "v", "left")
        contribs = (
            with_deg.filter(F.col("outd").isNotNull())
            .select("v", (F.col("rank") / F.col("outd")).alias("share"))
            .join(
                edges.select(
                    F.col(src).alias("v"), F.col(dst).alias("to")
                ),
                "v",
            )
            .groupBy(F.col("to").alias("v"))
            .agg(F.sum("share").alias("inflow"))
        )
        dangling = (
            with_deg.filter(F.col("outd").isNull())
            .groupBy()
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        new_ranks = (
            nodes.join(contribs, "v", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "v",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dm") / n_nodes
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(owned)
        ranks = new_ranks
        owned = ranks
    return ranks
