"""Graph analytics over edge DataFrames.

Connected components live in ``operators.dedup`` (hash-min and
large-star/small-star — they serve dup-pair clustering). This module
adds PageRank, the canonical iterative-join workload: it exercises the
join → aggregate → localCheckpoint loop shape that any fixed-point
graph algorithm on Spark reduces to.

Scale notes: per iteration exactly two shuffles (the contribution join
and the rank sum); ranks/degrees are data-sized DataFrames, never
driver-side; ``localCheckpoint`` truncates the lineage each round so
plan size stays constant across iterations (the classic iterative-
Spark pitfall is an exponentially growing plan). Dangling-node mass is
redistributed uniformly via a 1-row aggregate crossJoin — the standard
formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.operators._cache import persist_tracked


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """PageRank by power iteration, ``n_iter`` rounds, on a directed
    edge list. Returns (id, rank) with ranks summing to ~1.

    Float fixed-point iterations are order-sensitive in the last ulps
    (partial-sum ordering varies with partitioning), so this operator
    is rows-only at the harness; ``tests/test_graph.py`` checks the
    ranks against a dense numpy power iteration to 1e-9.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # scalar loop constants — one metadata-ish job
    if n_nodes == 0:
        # empty edge frame: no nodes to rank — return an empty (id, rank)
        # frame instead of a bare ZeroDivisionError from 1/n_nodes
        return nodes.withColumn("rank", F.lit(0.0))
    # degrees are loop-invariant: materialize ONCE (node-sized) instead
    # of re-aggregating the edge table inside every iteration — the
    # dangling-mass and contribution joins each re-evaluated this
    # aggregate every round (2 * n_iter edge-table passes)
    deg = e.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes

    for it in range(n_iter):
        with_deg = ranks.join(deg, ranks["id"] == deg["src"], "left").select(
            ranks["id"], "rank", "deg"
        )
        # dangling nodes (no out-edges) spread their mass uniformly
        dangling = with_deg.where(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contribs = (
            e.join(with_deg.where(F.col("deg").isNotNull()), e["src"] == with_deg["id"])
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = nodes.join(contribs, "id", "left").crossJoin(
            F.broadcast(dangling)
        ).select(
            "id",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("csum"), F.lit(0.0)) + F.col("dm") / n_nodes)
            ).alias("rank"),
        )
        # checkpoint every SECOND round (and the last): one round of
        # deferred lineage only doubles the plan's rank subtree (two
        # references per round), while each eager checkpoint is a full
        # job barrier — halving the barriers costs nothing at scale and
        # removes ~n_iter/2 driver round-trips per call. Values are
        # unchanged: the checkpoint only pins, never alters, the ranks.
        if it % 2 == 1 or it == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact global triangle count of the UNDIRECTED graph induced by
    ``edges`` (direction and duplicates ignored; self-loops dropped).
    Returns one row: (n_triangles bigint).

    Degree-ordered orientation (the standard distributed formulation,
    cf. Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer", WWW'11): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, then count each
    triangle at the unique edge whose both endpoints point at the
    third node via sorted-adjacency intersection. Fan-out is bounded
    by ORIENTED degree ≤ O(sqrt(m)) — the hub that breaks a naive
    neighbor join (celebrity nodes at web scale) contributes only
    edges pointing TO it, never an adjacency list centered on it.
    Work is O(m^{3/2}) total, hash-partitioned; nothing driver-side.
    """
    und = persist_tracked(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .dropna()
        .distinct()
    )
    deg = persist_tracked(
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    return _triangle_count_normalized(und, deg)


def _triangle_count_normalized(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Triangle count over an already-normalized graph: ``und`` the
    distinct undirected (a < b) edge list, ``deg`` its (v, d) degree
    table — both expected persisted by the caller.
    :func:`clustering_coefficient` enters here so its own und/deg
    materializations are not rebuilt a second time."""
    # orient by (degree, id): u -> v iff (d_u, u) < (d_v, v)
    da = und.join(deg.hint("shuffle_hash"), und["a"] == deg["v"]).select(
        "a", "b", F.col("d").alias("da")
    )
    dab = da.join(deg.hint("shuffle_hash"), da["b"] == deg["v"]).select(
        "a", "b", "da", F.col("d").alias("db")
    )
    fwd = F.when(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
        F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
    ).otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
    # oriented feeds THREE consumers (the adjacency build + two
    # adjacency joins): persist so the degree-join chain above runs
    # once — unpersisted, the whole edge-derivation subtree (which may
    # itself be an expensive self-join upstream) was instantiated per
    # consumer (observed: 62-exchange plan for the co-purchase graph)
    oriented = persist_tracked(dab.select(fwd.alias("e")).select("e.u", "e.w"))
    # Closure via compact adjacency instead of materializing wedges:
    # each triangle x->y, x->z, y->z is counted exactly once, at the
    # unique edge (x, y) whose BOTH endpoints point at z, so
    # n_triangles = Σ over oriented edges (u, w) of |N+(u) ∩ N+(w)|.
    # The former wedge self-join + closing semi-join shuffled the full
    # wedge set (Σ out-deg² rows — 49M at sf0.1, 3.1s of a 2.4s-query
    # budget); the adjacency arrays are bounded by the oriented
    # out-degree ≤ O(sqrt(m)) per node, so each per-edge intersect is
    # sqrt-bounded and the only shuffled frames are the edge list and
    # the node-sized adjacency table.
    adj = oriented.groupBy("u").agg(F.sort_array(F.collect_list("w")).alias("ns"))
    both = (
        oriented.join(adj.hint("shuffle_hash"), "u")
        .join(
            adj.select(
                F.col("u").alias("w"), F.col("ns").alias("ns_w")
            ).hint("shuffle_hash"),
            "w",
        )
        .select(F.size(F.array_intersect("ns", "ns_w")).alias("c"))
    )
    return both.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_triangles")
    )


def clustering_coefficient(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global clustering coefficient of the undirected graph:
    ``3 * triangles / wedges`` where wedges = Σ_v d(v)·(d(v)−1)/2.
    Returns one row (n_triangles, n_wedges, coefficient) — coefficient
    NULL for a wedge-free graph.

    Reuses :func:`triangle_count`'s degree-ordered closure for the
    numerator; the wedge count is one more aggregate over the same
    degree table. Both sides are exact integers, so the single final
    division is engine-exact (rounded at 9 for hashability).
    """
    und = persist_tracked(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .dropna()
        .distinct()
    )
    # deg feeds the wedge aggregate AND the triangle orientation joins
    # (twice) — persist, and enter the triangle closure at the
    # normalized seam so und is not re-distincted/re-persisted and deg
    # not re-aggregated a second time inside triangle_count
    deg = persist_tracked(
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    wedges = deg.agg(
        (F.sum(F.col("d") * (F.col("d") - 1)) / F.lit(2)).cast("long").alias("n_wedges")
    )
    tri = _triangle_count_normalized(und, deg)
    return tri.crossJoin(F.broadcast(wedges)).select(
        "n_triangles",
        "n_wedges",
        F.round(
            F.lit(3) * F.col("n_triangles").cast("double")
            / F.col("n_wedges").cast("double"),
            9,
        ).alias("coefficient"),
    )


def k_core(
    edges: DataFrame,
    k: int,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node has degree >= k, computed by iterative peeling (remove
    all nodes of degree < k, recompute, repeat to the fixed point —
    the standard Matula-Beck reduction). Returns surviving
    (node, core_degree) rows; core_degree is the degree INSIDE the
    core. The peeling order never affects the fixed point, so the
    result is deterministic on any layout.

    Distributed shape per round: one degree aggregate + two anti-joins
    against the (shrinking) low-degree node set — edges only ever
    shrink, and ``localCheckpoint`` pins each round so plan depth
    stays constant (the pagerank/kmeans iterative discipline). Rounds
    are bounded by the degeneracy peeling depth — tiny for real
    graphs; ``max_iter`` is the runaway bound.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    sym = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)
    for _ in range(max_iter):
        # the degree table is consumed twice per round (the emptiness
        # probe and the anti-join's low set): checkpoint it once so the
        # edge-table aggregate runs once per round, not twice
        deg = (
            sym.groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=True)
        )
        low = deg.where(F.col("deg") < k).select("a")
        if low.isEmpty():
            return deg.select(F.col("a").alias("node"), F.col("deg").alias("core_degree"))
        sym = (
            sym.join(low, "a", "left_anti")
            .join(low.select(F.col("a").alias("b")), "b", "left_anti")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"k_core did not converge within {max_iter} rounds")


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    *,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any source vertex,
    bounded at ``max_hops``. Returns (node, hop) for every vertex
    reachable within the bound; sources themselves report hop 0.

    Distributed shape per round: one equi-join of the CURRENT FRONTIER
    against the edge table + one anti-join against the visited set —
    the frontier (not the whole graph) drives each round's shuffle, so
    a round costs O(frontier-adjacency), the textbook level-synchronous
    BFS on a relational engine. ``localCheckpoint`` pins each level
    (the pagerank/k_core iterative discipline) so plan depth stays
    constant; rounds are bounded by ``max_hops`` and exit early the
    moment a frontier is empty. Nothing ever collects to the driver —
    visited/frontier are DataFrames end to end, so the same loop runs
    on a 100 TB edge table with the edge side bucketed on ``src``.

    The reference engine has no graph surface; this extends the
    repo's iterative family (pagerank, k_core, star-contraction CC)
    with the reachability primitive the others assume.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    # the edge frame is consumed once per level: persist so an expensive
    # upstream derivation (e.g. a basket self-join) runs once, not once
    # per round
    e = persist_tracked(edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")))
    visited = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["__s"])
            .select(F.col("__d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    *,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    node_col: str = "node",
) -> DataFrame:
    """Bounded-hop single/multi-source shortest paths: minimum total
    edge weight over paths using at most ``max_hops`` edges —
    Bellman-Ford with the frontier optimization (only nodes improved
    last round relax their out-edges this round). Returns (node, cost)
    for every node reachable within the bound; sources report cost 0.

    Negative weights are rejected: with the hop bound they would make
    "cost" depend on the bound in surprising ways, and every curation
    use (link distance, latency, tax) is nonnegative.

    Distributed shape per round: one frontier-edge equi-join + one
    min aggregate + one left join against the running distance table —
    all key-partitioned shuffles, nothing driver-side, rounds pinned by
    ``localCheckpoint`` (the pagerank/k_core/bfs_hops discipline). A
    converged round (no improvement anywhere) exits early, at which
    point the answer equals the UNBOUNDED shortest path.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    # persisted: consumed by the weight guard plus one join per round
    e = persist_tracked(
        edges.select(
            F.col(src).alias("__s"),
            F.col(dst).alias("__d"),
            F.col(weight).cast("long").alias("__w"),
        )
    )
    if not e.where(F.col("__w") < 0).isEmpty():
        raise ValueError("shortest_paths requires nonnegative edge weights")
    dist = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("cost", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for _ in range(max_hops):
        cand = (
            frontier.join(e, frontier["node"] == e["__s"])
            .select(
                F.col("__d").alias("node"),
                (F.col("cost") + F.col("__w")).alias("cost"),
            )
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
        improved = (
            cand.join(
                dist.select("node", F.col("cost").alias("__old")), "node", "left"
            )
            .where(F.col("__old").isNull() | (F.col("cost") < F.col("__old")))
            .select("node", "cost")
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved.select("node"), "node", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    return dist
