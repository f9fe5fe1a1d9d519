from __future__ import annotations

import numpy as np
import pytest


def _numpy_pagerank(n, edge_list, damping=0.85, n_iter=10):
    """Dense reference power iteration with uniform dangling spread —
    the same update rule the operator implements."""
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contribs = np.zeros(n)
        for s, d in edge_list:
            contribs[d] += r[s] / out_deg[s]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) / n + damping * (contribs + dangling / n)
    return r


def test_pagerank_matches_dense_reference(spark):
    from skylinemapreducehadoop_spark.operators.graph import pagerank

    # ring + hub + a dangling node (exercises every term of the update)
    edges = [(i, (i + 1) % 5) for i in range(5)]
    edges += [(5, 0), (5, 1), (5, 2)]  # hub fanning into the ring
    edges += [(2, 6)]  # node 6 dangles (no out-edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(df, n_iter=12).collect()}
    want = _numpy_pagerank(7, edges, n_iter=12)
    assert set(got) == set(range(7))
    for i in range(7):
        assert got[i] == pytest.approx(want[i], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_plan_size_constant(spark):
    # localCheckpoint must truncate lineage: the final plan string may
    # not grow with iteration count (the iterative-Spark pitfall)
    from skylinemapreducehadoop_spark.operators.graph import pagerank

    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    p3 = pagerank(df, n_iter=3)._jdf.queryExecution().executedPlan().toString()
    p6 = pagerank(df, n_iter=6)._jdf.queryExecution().executedPlan().toString()
    assert abs(len(p6) - len(p3)) < len(p3) * 0.5


def test_pagerank_empty_graph(spark):
    # an empty edge frame returns an empty (id, rank) frame — not a
    # bare ZeroDivisionError (r6 ADVICE)
    from skylinemapreducehadoop_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "src long, dst long")
    out = pagerank(df, n_iter=3)
    assert out.columns == ["id", "rank"]
    assert out.count() == 0


def test_triangle_count_known_graphs(spark):
    from skylinemapreducehadoop_spark.operators.graph import triangle_count

    # K4 has C(4,3)=4 triangles; direction/duplicates/self-loops noise
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]  # both dirs
    edges += [(0, 0), (1, 1), (2, 3), (3, 2)]  # self-loops + dups
    df = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_count(df).collect()[0]["n_triangles"] == 4

    # path graph: zero triangles
    path = spark.createDataFrame([(i, i + 1) for i in range(10)], "src long, dst long")
    assert triangle_count(path).collect()[0]["n_triangles"] == 0


def test_triangle_count_matches_brute_force(spark):
    import itertools
    import random

    from skylinemapreducehadoop_spark.operators.graph import triangle_count

    rng = random.Random(5)
    und = {tuple(sorted(rng.sample(range(30), 2))) for _ in range(160)}
    want = sum(
        1
        for a, b, c in itertools.combinations(range(30), 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )
    df = spark.createDataFrame(list(und), "src long, dst long")
    assert triangle_count(df).collect()[0]["n_triangles"] == want


def test_clustering_coefficient_known_graphs(spark):
    from skylinemapreducehadoop_spark.operators.graph import clustering_coefficient

    # K4: 4 triangles, wedges = 4 * C(3,2) = 12, coefficient = 1.0
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], "src long, dst long"
    )
    row = clustering_coefficient(k4).collect()[0]
    assert (row["n_triangles"], row["n_wedges"], row["coefficient"]) == (4, 12, 1.0)

    # star K1,4: wedges = C(4,2) = 6, no triangles -> 0.0
    star = spark.createDataFrame([(0, i) for i in range(1, 5)], "src long, dst long")
    row = clustering_coefficient(star).collect()[0]
    assert (row["n_triangles"], row["n_wedges"], row["coefficient"]) == (0, 6, 0.0)


def test_k_core_planted_structures(spark):
    import itertools

    import pytest

    from skylinemapreducehadoop_spark.operators.graph import k_core

    edges = []
    # K5 clique on 0..4 (every node degree 4)
    edges += list(itertools.combinations(range(5), 2))
    # triangle 10-11-12 (degree 2) attached to the clique via 0-10
    edges += [(10, 11), (11, 12), (10, 12), (0, 10)]
    # path 20-21-22 (max degree 2)
    edges += [(20, 21), (21, 22)]
    # K4 on 30..33 (degree 3)
    edges += list(itertools.combinations(range(30, 34), 2))
    # duplicate + reversed + self-loop noise must not change anything
    edges += [(1, 0), (0, 1), (7, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")

    got3 = {r["node"]: r["core_degree"] for r in k_core(df, 3).collect()}
    # 3-core: K5 (the 10-attachment and triangle peel away) + K4
    assert got3 == {**{n: 4 for n in range(5)}, **{n: 3 for n in range(30, 34)}}

    got2 = {r["node"]: r["core_degree"] for r in k_core(df, 2).collect()}
    # 2-core adds the triangle AND the 0-10 bridge (both endpoints keep
    # degree >= 2, so the bridge edge itself survives); the path peels
    assert got2[10] == 3 and got2[11] == 2 and got2[12] == 2
    assert got2[0] == 5  # clique degree 4 + the bridge
    assert 20 not in got2 and 21 not in got2

    # k above the max degree peels everything
    assert k_core(df, 6).count() == 0
    with pytest.raises(ValueError):
        k_core(df, 0)


def test_bfs_hops_known_distances(spark):
    from skylinemapreducehadoop_spark.operators.graph import bfs_hops

    # path 0-1-2-3-4-5 plus a shortcut 0->3 and an unreachable island 9
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 3), (9, 10)]
    und = edges + [(b, a) for a, b in edges]
    e = spark.createDataFrame(und, "src long, dst long")
    srcs = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["hop"] for r in bfs_hops(e, srcs, max_hops=10).collect()}
    assert got == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2, 5: 3}


def test_bfs_hops_multi_source_min_and_cap(spark):
    from skylinemapreducehadoop_spark.operators.graph import bfs_hops

    # chain 0-1-2-3-4-5-6; sources at both ends -> hop = min distance
    edges = [(i, i + 1) for i in range(6)]
    und = edges + [(b, a) for a, b in edges]
    e = spark.createDataFrame(und, "src long, dst long")
    srcs = spark.createDataFrame([(0,), (6,)], "node long")
    got = {r["node"]: r["hop"] for r in bfs_hops(e, srcs, max_hops=10).collect()}
    assert got == {0: 0, 6: 0, 1: 1, 5: 1, 2: 2, 4: 2, 3: 3}
    # hop cap truncates the far levels, never alters the near ones
    capped = {
        r["node"]: r["hop"]
        for r in bfs_hops(e, srcs.where("node = 0"), max_hops=2).collect()
    }
    assert capped == {0: 0, 1: 1, 2: 2}
    # max_hops=0 returns exactly the (deduplicated) source set
    zero = bfs_hops(e, srcs.union(srcs), max_hops=0).collect()
    assert {(r["node"], r["hop"]) for r in zero} == {(0, 0), (6, 0)}


def test_bfs_hops_plan_size_constant(spark):
    from skylinemapreducehadoop_spark.operators.graph import bfs_hops

    edges = [(i, i + 1) for i in range(40)]
    e = spark.createDataFrame(edges + [(b, a) for a, b in edges], "src long, dst long")
    srcs = spark.createDataFrame([(0,)], "node long")
    p3 = bfs_hops(e, srcs, max_hops=3)._jdf.queryExecution().toString()
    p12 = bfs_hops(e, srcs, max_hops=12)._jdf.queryExecution().toString()
    # localCheckpoint pins each level: plan must not grow with rounds
    assert len(p12) < 3 * len(p3)


def test_bfs_hops_rejects_negative_cap(spark):
    from skylinemapreducehadoop_spark.operators.graph import bfs_hops
    import pytest as _pytest

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    s = spark.createDataFrame([(0,)], "node long")
    with _pytest.raises(ValueError):
        bfs_hops(e, s, max_hops=-1)


def test_shortest_paths_known_costs(spark):
    from skylinemapreducehadoop_spark.operators.graph import shortest_paths

    # 0 -> 1 (w=10), 0 -> 2 (w=1), 2 -> 1 (w=2): the 2-hop detour wins
    edges = [(0, 1, 10), (0, 2, 1), (2, 1, 2), (1, 3, 1)]
    e = spark.createDataFrame(edges, "src long, dst long, weight long")
    s = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["cost"] for r in shortest_paths(e, s, max_hops=10).collect()}
    assert got == {0: 0, 2: 1, 1: 3, 3: 4}
    # hop bound 1: only direct edges — the detour is not available yet
    got1 = {r["node"]: r["cost"] for r in shortest_paths(e, s, max_hops=1).collect()}
    assert got1 == {0: 0, 1: 10, 2: 1}
    # hop bound 2: detour reachable, but 3 still out of reach via it;
    # bounded-hop min must keep the best <=2-edge path (0->1 direct=10
    # loses to 0->2->1=3; 0->1->3 = 11 is the only <=2-edge path to 3)
    got2 = {r["node"]: r["cost"] for r in shortest_paths(e, s, max_hops=2).collect()}
    assert got2 == {0: 0, 1: 3, 2: 1, 3: 11}


def test_shortest_paths_multi_source_and_negative_reject(spark):
    import pytest as _pytest

    from skylinemapreducehadoop_spark.operators.graph import shortest_paths

    edges = [(0, 1, 5), (9, 1, 1)]
    e = spark.createDataFrame(edges, "src long, dst long, weight long")
    s = spark.createDataFrame([(0,), (9,)], "node long")
    got = {r["node"]: r["cost"] for r in shortest_paths(e, s, max_hops=4).collect()}
    assert got == {0: 0, 9: 0, 1: 1}
    neg = spark.createDataFrame([(0, 1, -2)], "src long, dst long, weight long")
    with _pytest.raises(ValueError, match="nonnegative"):
        shortest_paths(neg, s, max_hops=2)


def test_shortest_paths_matches_bfs_on_unit_weights(spark):
    from skylinemapreducehadoop_spark.operators.graph import bfs_hops, shortest_paths

    from pyspark.sql import functions as F

    edges = [(i, (i * 3 + 1) % 17) for i in range(17)] + [(i, (i + 5) % 17) for i in range(17)]
    e = spark.createDataFrame(edges, "src long, dst long").withColumn("weight", F.lit(1))
    s = spark.createDataFrame([(0,)], "node long")
    hops = {r["node"]: r["hop"] for r in bfs_hops(e.drop("weight"), s, max_hops=6).collect()}
    costs = {r["node"]: r["cost"] for r in shortest_paths(e, s, max_hops=6).collect()}
    assert hops == costs
