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
