"""Graph analytics (operators/graph.py): triangle counting vs a python
brute force (incl. a hub-skew graph — the 'last reducer' case the
degree orientation exists for), PageRank vs power iteration with
dangling mass. Engine-vs-DuckDB parity runs in test_oracle_parity
(triangle_part_pairs)."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.operators.graph import (
    pagerank,
    triangle_count,
    undirected_edges,
)


def _brute_triangles(edges):
    adj = {}
    es = set()
    for u, v in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        es.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(
        1
        for a, b in es
        for c in adj[a] & adj[b]
        if c > b
    )


def _count(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return triangle_count(df).collect()[0]["n_triangles"]


def test_triangles_known_graphs(spark):
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    assert _count(spark, k4) == 4
    path = [(0, 1), (1, 2), (2, 3)]
    assert _count(spark, path) == 0
    # duplicates / reversed / self-loops are canonicalized away
    noisy = k4 + [(b, a) for a, b in k4] + [(1, 1), (2, 2)] + k4
    assert _count(spark, noisy) == 4


def test_triangles_random_vs_brute(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(300)})
    assert _count(spark, edges) == _brute_triangles(edges)


def test_triangles_hub_skew(spark):
    """A hub connected to everything: the raw wedge join would fan the
    hub k^2-wide; orientation keeps it correct (and bounded)."""
    hub = [(0, i) for i in range(1, 60)]
    ring = [(i, i + 1) for i in range(1, 59)]
    edges = hub + ring
    # every ring edge closes a triangle with the hub: 58 triangles
    assert _count(spark, edges) == 58


def test_pagerank_matches_power_iteration(spark):
    # node 5 is a SINK (no out-edges) — exercises the dangling-mass path
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["v"]: r["rank"] for r in pagerank(df, iters=20).collect()}
    # python power iteration, same convention (sum == N, dangling uniform)
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    rank = {v: 1.0 for v in nodes}
    for _ in range(20):
        inflow = {v: 0.0 for v in nodes}
        dm = 0.0
        for u in nodes:
            if u in out:
                for v in out[u]:
                    inflow[v] += rank[u] / len(out[u])
            else:
                dm += rank[u]
        rank = {
            v: 0.15 + 0.85 * (inflow[v] + dm / n) for v in nodes
        }
    for v in nodes:
        assert abs(got[v] - rank[v]) < 1e-9, (v, got[v], rank[v])
    assert abs(sum(got.values()) - n) < 1e-6


def test_undirected_canonicalization(spark):
    df = spark.createDataFrame([(2, 1), (1, 2), (3, 3)], "src long, dst long")
    got = sorted(map(tuple, undirected_edges(df).collect()))
    assert got == [(1, 2)]
