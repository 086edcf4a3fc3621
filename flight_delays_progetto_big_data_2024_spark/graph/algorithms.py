"""Native DataFrame graph algorithms (SURVEY.md §2.8).

The reference delegates to GraphFrames 0.6 (a Scala package + runtime
JAR) for in-degree, PageRank and triangle counting (reference
graphframes_flights.py:34-49, 116-133). Here each is plain DataFrame
algebra — no extra JAR, deterministic, testable against hand-computed
golden graphs:

- degrees: groupBy + count (exactly GraphFrames' inDegrees semantics);
- pagerank: GraphX-style iterate ``rank = reset + (1-reset) * Σ
  rank_u/outdeg_u`` starting from rank=1 (ranks sum ≤ |V|, dangling
  mass is dropped — same as GraphX's static PageRank, which GraphFrames
  wraps with these exact semantics);
- triangle_count: canonicalize to an undirected simple graph, enumerate
  each triangle once via a double self-join with ``u < v < w``, then
  credit all three corners.

Scale posture: the per-iteration state of PageRank is one row per
vertex; each iteration is one shuffle (groupBy dst) plus a broadcast-
able join against the out-degree table. ``localCheckpoint`` truncates
the 10-iteration lineage so plan size stays constant. Triangle
enumeration shuffles on edge endpoints; worst-case cost is bounded by
sum-of-squared-degrees — salting/AQE handles hub skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _vertices_from_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
    )


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex (in_degree, out_degree) over the directed edge set —
    GraphFrames' inDegrees/outDegrees as one aggregation each
    (reference graphframes_flights.py:37-41; SURVEY.md G2)."""
    in_deg = edges.groupBy(F.col(dst).alias("id")).agg(
        F.count("*").alias("in_degree")
    )
    out_deg = edges.groupBy(F.col(src).alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    verts = _vertices_from_edges(edges, src, dst)
    return (
        verts.join(in_deg, "id", "left")
        .join(out_deg, "id", "left")
        .na.fill(0, ["in_degree", "out_degree"])
    )


def pagerank(
    edges: DataFrame,
    reset_prob: float = 0.15,
    max_iter: int = 10,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    checkpoint: bool = True,
    checkpoint_interval: int = 3,
    num_partitions: int | None = None,
    weight_col: str | None = None,
    broadcast_graph: bool = False,
) -> DataFrame:
    """Static PageRank with GraphX/GraphFrames semantics (reference
    graphframes_flights.py:44-46: resetProbability=0.15, maxIter=10).

    Returns (id, pagerank). ``vertices`` (an ``id`` column) defaults to
    src ∪ dst. Distinct parallel edges are kept as distinct contribution
    channels only if present in ``edges`` — pass a deduped edge set for
    simple-graph semantics.

    ``num_partitions`` pins the loop's exchanges to an explicit width.
    Iterative jobs pay the per-task scheduling cost ``iterations``
    times, so partition count should track GRAPH size, not the session
    default: a 25-vertex graph wants 1-8 partitions, a billion-edge
    graph wants thousands. Leave ``None`` to inherit the session
    shuffle setting (AQE coalesces after stats, but the first exchange
    of every stage still schedules the full width).
    """
    # Persist the edge list FIRST: vertices, out-degrees and the contrib
    # base all derive from it, and the caller's edge derivation may be an
    # arbitrarily expensive join pipeline — without persist it would
    # re-execute in every iteration (10× the scan + shuffle cost at
    # 100 TB).
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    if num_partitions:
        e = e.repartition(num_partitions, "src")
    e = e.persist()
    verts = (vertices or _vertices_from_edges(e, "src", "dst")).select("id")

    # No broadcast hints: out-degree and rank tables are O(|V|) — forcing
    # a broadcast is a scale bug at billions of vertices. AQE converts
    # these joins to broadcast at runtime whenever the side is small.
    # weighted: contribution splits rank by edge weight share instead of
    # 1/out_degree; with no weight_col every edge weighs 1.0 and this is
    # exactly the classic formulation
    out_deg = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # a vertex whose out-weights sum to 0 cannot split rank by weight
    # share (rank*w/out_w divides by zero — an ANSI-mode abort); treat
    # it as DANGLING, exactly like a vertex with no out-edges: its
    # edges carry no contribution. Unweighted graphs never hit this
    # (every edge weighs 1.0).
    contrib_base = e.join(out_deg, "src").filter(F.col("out_w") != 0)

    verts = verts.persist()
    contrib_base = contrib_base.persist()

    cb_join = F.broadcast(contrib_base) if broadcast_graph else contrib_base
    verts_join = F.broadcast(verts) if broadcast_graph else verts
    ranks = verts.withColumn("rank", F.lit(1.0))
    for i in range(max_iter):
        contribs = cb_join.join(
            ranks, cb_join["src"] == ranks["id"]
        ).select(
            "dst", (F.col("rank") * F.col("w") / F.col("out_w")).alias("contrib")
        )
        if num_partitions:
            # pre-partitioning on the agg key at the pinned width means
            # the groupBy needs no further exchange
            contribs = contribs.repartition(num_partitions, "dst")
        contribs = contribs.groupBy("dst").agg(F.sum("contrib").alias("mass"))
        ranks = verts_join.join(
            contribs, verts_join["id"] == contribs["dst"], "left"
        ).select(
            "id",
            (
                F.lit(reset_prob)
                + F.lit(1.0 - reset_prob) * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("rank"),
        )
        if checkpoint and (i + 1) % checkpoint_interval == 0:
            # truncate lineage so the plan doesn't grow unboundedly; every
            # few iterations balances plan depth vs checkpoint cost
            ranks = ranks.localCheckpoint(eager=False)
    result = ranks.select("id", F.col("rank").alias("pagerank"))
    if checkpoint:
        # materialize the final ranks so the loop inputs can be released
        # without ever recomputing the iteration chain
        result = result.localCheckpoint(eager=True)
        verts.unpersist()
        contrib_base.unpersist()
        e.unpersist()
    return result


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) with ``component`` = minimum vertex id in the
    connected component (undirected reachability; GraphFrames'
    connectedComponents contract). Vertices absent from any edge (pass
    ``vertices`` with an ``id`` column to include them) are their own
    singleton components.

    Min-label propagation: each round every vertex takes the minimum of
    its own label and its neighbors' labels; converged when a round
    changes nothing. Rounds needed = graph diameter — the right regime
    for near-dup clusters (tiny diameter); per round it's one shuffle
    (groupBy vertex) plus an O(|V|) join, the same footprint as a
    pagerank iteration, with lineage truncated via localCheckpoint.
    The convergence probe is a metadata-free count on the changed set —
    no driver-side collection of vertex data.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        .distinct()
        .persist()
    )
    verts = (vertices or _vertices_from_edges(sym, "u", "v")).select("id").persist()
    labels = verts.withColumn("comp", F.col("id")).localCheckpoint(eager=False)
    for i in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["v"] == labels["id"])
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # eager checkpoint every round: the round's shuffle output is
        # O(|V|) and both the convergence probe and the next round read
        # it — materializing once beats recomputing the join chain twice
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["u"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    verts.unpersist()
    return labels.select("id", F.col("comp").alias("component"))


def undirected_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonical simple undirected edge set: (u, v) with u < v, self-loops
    dropped, duplicates and reverse duplicates collapsed — the
    canonicalization GraphFrames' triangleCount applies internally
    (SURVEY.md §7 risk register)."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_graph: bool = False,
) -> DataFrame:
    """Per-vertex triangle membership count, GraphFrames semantics
    (reference graphframes_flights.py:48-49): each triangle of the
    canonicalized undirected graph credits all three corners once.

    Enumeration: edges (u<v) joined (v,w) then closed by (u,w); the
    ``u < v < w`` ordering guarantees each triangle appears exactly once.

    ``broadcast_graph``: opt-in for DIMENSION-sized graphs (same policy
    as :func:`pagerank` — never forced in the library, a forced
    broadcast is the scale bug at billions of edges). When set, the
    undirected edge set is persisted (its derivation may be a fact-scale
    aggregation that would otherwise run once per self-join) and the two
    closing joins plus the corner decoration run as broadcast hash
    joins — no shuffle beyond the edge derivation itself. The caller
    owns the persisted edge set's lifetime (see session.release_caches).
    """
    und = undirected_edges(edges, src, dst)
    if broadcast_graph:
        und = und.persist()
    b = F.broadcast if broadcast_graph else (lambda df: df)
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    triangles = (
        e1.join(b(e2), F.col("b") == F.col("b2"))
        .join(b(e3), (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    corner_counts = (
        triangles.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("triangle_count"))
    )
    verts = _vertices_from_edges(edges, src, dst)
    return (
        verts.join(b(corner_counts), "id", "left").na.fill(0, ["triangle_count"])
    )


def shortest_hops(
    edges: DataFrame,
    source: DataFrame,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Single-source BFS: minimum hop count from ``source`` (a 1-row
    DataFrame with an ``id`` column — kept as a plan, not a collected
    scalar) to every reachable vertex within ``max_hops``.

    Frontier expansion as iterative joins: each round joins the CURRENT
    frontier (not the full distance table) to the edge list, anti-joins
    already-settled vertices, and unions the new layer in. The per-round
    ``isEmpty`` early-exit is a control-plane action on an
    already-shrunk frontier — the standard BFS driver loop; data never
    collects. Frontiers persist for the round they're used and
    distances localCheckpoint so lineage stays O(1) per round rather
    than O(rounds²) at replay.
    """
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).persist()
    dist = source.select(F.col("id"), F.lit(0).alias("hops")).persist()
    frontier = dist.select("id")
    prev_frontier = None  # persisted frontier backing `frontier`
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["id"] == e["__s"])
            .select(F.col("__d").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .withColumn("hops", F.lit(h))
            .persist()
        )
        if nxt.isEmpty():
            nxt.unpersist()
            break
        new_dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        dist.unpersist()
        dist = new_dist
        # the eager checkpoint above fully materialized nxt's cache, so
        # the frontier that produced it is dead — drop it now instead of
        # leaking every round's frontier until function exit
        if prev_frontier is not None:
            prev_frontier.unpersist()
        prev_frontier = nxt
        frontier = nxt.select("id")
    if prev_frontier is not None:
        prev_frontier.unpersist()
    e.unpersist()
    return dist


def cheapest_paths(
    edges: DataFrame,
    source: DataFrame,
    weight_col: str = "w",
    max_legs: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Single-source CHEAPEST paths (Bellman-Ford, ``max_legs``
    relaxation rounds): minimum total edge weight from ``source`` (a
    1-row DataFrame with an ``id`` column — a plan, never a collected
    scalar) to every vertex reachable in ≤ ``max_legs`` edges.

    Each round relaxes the full tentative-distance table against the
    edge list (one keyed join + one min-aggregate — two shuffles per
    round, the textbook distributed Bellman-Ford), then localCheckpoints
    so lineage stays O(1) per round. Early exit when a round improves
    nothing. INTEGER weights keep min-plus sums exact, so the result is
    engine-portable bit-for-bit (doubles would make path-sum ties
    association-order dependent)."""
    e = edges.select(
        F.col(src).alias("__s"),
        F.col(dst).alias("__d"),
        F.col(weight_col).alias("__w"),
    ).persist()
    dist = source.select(
        F.col("id"), F.lit(0).cast("long").alias("cost")
    ).localCheckpoint(eager=True)
    for _ in range(max_legs):
        relaxed = (
            dist.join(e, dist["id"] == e["__s"])
            .select(F.col("__d").alias("id"), (F.col("cost") + F.col("__w")).alias("cost"))
        )
        new_dist = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
        # converged? (control-plane scalar on the vertex-sized table):
        # isEmpty() == True means NO row improved this leg
        converged = (
            new_dist.join(dist.withColumnRenamed("cost", "old"), "id", "left")
            .filter(F.col("old").isNull() | (F.col("cost") < F.col("old")))
            .isEmpty()
        )
        dist = new_dist
        if converged:
            break
    e.unpersist()
    return dist
