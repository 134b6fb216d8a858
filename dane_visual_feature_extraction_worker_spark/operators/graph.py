"""Distributed graph operators over candidate-pair graphs: triangle
counting via degree-ordered edge orientation.

The near-dup machinery (MinHash/LSH banding, dedup.py) produces an
undirected candidate graph; its triangle structure separates genuine
duplicate CLIQUES from chains of borderline pairs (a clique of k
near-identical docs has C(k,3) triangles; a transitive chain has
none).  Connected components (dedup.connected_components) answers
"which cluster"; triangles answer "how cohesive".

The naive plan — join edges to edges to edges — explodes on hot
nodes: a degree-d node contributes d^2 wedges.  The standard
distributed fix (node-iterator++ / Cohen's MapReduce algorithm) is to
ORIENT every edge from the endpoint with smaller (degree, id) to the
larger, which caps every out-degree at O(sqrt(m)): wedges are built
only from ORIENTED out-edges, so the hot node's d^2 collapses to the
oriented out-degree squared.  Three uniform-key equi-joins total —
hash-partitionable, AQE-skew-splittable, no theta join anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def orient_edges(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Orient an undirected simple edge list by (degree, id): emits
    ``(a, b)`` with (deg(a), a) < (deg(b), b) lexicographically.

    ``edges`` must be canonical-undirected (one row per unordered
    pair; src != dst).  Degrees come from one union + groupBy over the
    endpoints (uniform key: node id); the two degree lookups are plain
    equi-joins on the node spine — broadcast when the spine is small,
    shuffle otherwise (left to AQE).
    """
    deg = (
        edges.select(F.col(src).alias("__v"))
        .unionAll(edges.select(F.col(dst).alias("__v")))
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    e = (
        edges.join(deg.withColumnRenamed("__v", src), src)
        .withColumnRenamed("__d", "__ds")
        .join(deg.withColumnRenamed("__v", dst), dst)
        .withColumnRenamed("__d", "__dd")
    )
    fwd = (F.col("__ds") < F.col("__dd")) | (
        (F.col("__ds") == F.col("__dd")) & (F.col(src) < F.col(dst))
    )
    return e.select(
        F.when(fwd, F.col(src)).otherwise(F.col(dst)).alias("a"),
        F.when(fwd, F.col(dst)).otherwise(F.col(src)).alias("b"),
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts ``(node, n_triangles)`` over an
    undirected simple graph; nodes in no triangle are omitted.

    Plan: orient (see ``orient_edges``), build wedges by joining
    oriented out-edges on the middle vertex (a->b, b->c), close each
    wedge with a semi-check join against the oriented edge (a->c) —
    every triangle is found exactly once because orientation makes the
    triangle a DAG with a unique source.  The corner explode (each
    triangle credits its 3 vertices) is a 3-row array explode, then
    one map-side-combined count.
    """
    o = orient_edges(edges, src, dst)
    w = o.alias("e1").join(
        o.alias("e2"), F.col("e1.b") == F.col("e2.a")
    ).select(
        F.col("e1.a").alias("ta"),
        F.col("e1.b").alias("tb"),
        F.col("e2.b").alias("tc"),
    )
    tri = w.join(
        o.alias("e3"),
        (F.col("ta") == F.col("e3.a")) & (F.col("tc") == F.col("e3.b")),
    ).select("ta", "tb", "tc")
    return (
        tri.select(
            F.explode(F.array("ta", "tb", "tc")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def label_propagation(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    rounds: int = 3,
) -> DataFrame:
    """Synchronous label-propagation COMMUNITIES over the candidate
    graph, fixed ``rounds`` → ``(id_col, community)``: the modularity
    view connected components can't give — CC says "reachable", LPA
    says "densely attached"; a bridge between two template families
    keeps one CC but two LPA communities.

    Semantics are fully deterministic so an UNROLLED SQL oracle
    replays every round: synchronous updates (round r+1 reads only
    round r), new label = the modal label among neighbors with ties
    to the SMALLEST label (row_number over (count desc, label asc)),
    isolated nodes keep their current label; labels start as the
    node's own id.  Fixed round count (not convergence-detected):
    oscillation is LPA's known failure mode under synchronous updates,
    and a deterministic round budget is what a replayable gate — and a
    100 TB production run with a wall-clock budget — both want.

    Per round: ONE uniform-key join (edges x labels on the source
    endpoint — the LSH graph's ids are md5-uniform), ONE map-side-
    combined (node, label) count, ONE window over the count frame
    (neighbor-label-pairs-sized, not corpus-sized), one left join back
    to the spine for isolated-node carry.  Edges and the spine pin
    once; labels localCheckpoint per round (the connected_components /
    Lloyd lineage discipline).
    """
    from pyspark.sql import Window

    edges = (
        pairs.select(F.col("doc_a").alias("__s"), F.col("doc_b").alias("__t"))
        .unionAll(
            pairs.select(
                F.col("doc_b").alias("__s"), F.col("doc_a").alias("__t")
            )
        )
        .persist()
    )
    labels = nodes.select(
        F.col(id_col).alias("__node"), F.col(id_col).alias("__lab")
    ).localCheckpoint()
    try:
        w = Window.partitionBy("__t").orderBy(
            F.col("__cnt").desc(), F.col("__lab").asc()
        )
        for _ in range(rounds):
            counts = (
                edges.join(labels, edges["__s"] == labels["__node"])
                .groupBy("__t", "__lab")
                .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
            )
            modal = (
                counts.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .select(F.col("__t").alias("__node"), F.col("__lab").alias("__new"))
            )
            labels = (
                labels.join(modal, "__node", "left")
                .select(
                    "__node",
                    F.coalesce("__new", "__lab").alias("__lab"),
                )
                .localCheckpoint()
            )
        return labels.select(
            F.col("__node").alias(id_col), F.col("__lab").alias("community")
        )
    finally:
        edges.unpersist()


def kcore_peel(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    k: int = 2,
    max_iters: int = 30,
) -> DataFrame:
    """k-core decomposition of the candidate graph by iterative
    peeling → ``(id_col, rounds_survived, in_kcore)``: repeatedly
    remove nodes with fewer than ``k`` neighbors among the still-alive
    set; survivors form the k-core.  The third cohesion lens next to
    triangles and LPA: the 2-core strips every tree/chain appendage a
    banded LSH generator hangs off a genuine dup clique (a chain of
    borderline pairs has NO 2-core; any cycle/clique does), and
    ``rounds_survived`` grades how deep in the periphery a node sat
    (0 = isolated or leaf at the first peel).

    Per round: the symmetric edge list is semi-joined to the alive set
    on BOTH endpoints (two uniform-key joins), one map-side-combined
    degree count, one semi + one anti join against the alive spine.
    The SHRUNKEN edge list is checkpointed and becomes next round's
    graph — peeling is monotone, so per-round work tracks the
    shrinking periphery, not the original corpus; rounds needed = the
    graph's degeneracy ordering depth (single digits on near-clique
    dup graphs).  Convergence = a round that removes nothing (one
    scalar count per round, the connected_components discipline);
    raises past ``max_iters`` rather than returning a partial peel.
    Core members report ``rounds_survived`` NULL (they never fell) —
    matching a fixed-depth SQL replay whose cap equals ``max_iters``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sym = pairs.select(
        F.col("doc_a").alias("__s"), F.col("doc_b").alias("__t")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("__s"), F.col("doc_a").alias("__t"))
    )
    alive = nodes.select(F.col(id_col).alias("__node")).localCheckpoint()
    removed_frames: list[DataFrame] = []
    converged = False
    for it in range(1, max_iters + 1):
        sym = (
            sym.join(
                alive.select(F.col("__node").alias("__s")), "__s", "left_semi"
            )
            .join(
                alive.select(F.col("__node").alias("__t")), "__t", "left_semi"
            )
            .localCheckpoint()
        )
        deg = (
            sym.groupBy("__t")
            .agg(F.count(F.lit(1)).alias("__deg"))
            .where(F.col("__deg") >= k)
            .select(F.col("__t").alias("__node"))
        )
        survivors = alive.join(deg, "__node", "left_semi").localCheckpoint()
        removed = (
            alive.join(survivors, "__node", "left_anti")
            .select(
                "__node",
                F.lit(it - 1).cast("bigint").alias("rounds_survived"),
            )
            .localCheckpoint()
        )
        alive = survivors
        if removed.count() == 0:
            converged = True
            break
        removed_frames.append(removed)
    if not converged:
        raise RuntimeError(f"kcore_peel did not converge in {max_iters} rounds")
    out = alive.select(
        "__node",
        F.lit(None).cast("bigint").alias("rounds_survived"),
        F.lit(True).alias("in_kcore"),
    )
    for r in removed_frames:
        out = out.unionByName(r.withColumn("in_kcore", F.lit(False)))
    return out.withColumnRenamed("__node", id_col)


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node over an undirected simple
    graph: cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — the per-node
    "how clique-like is my neighborhood" score that separates a dup
    CLIQUE member (cc→1) from a hub that merely bridges many
    near-cliques (high degree, low cc).  Output ``(node, degree,
    n_triangles, cc_micro)`` for every node with degree ≥ 2 (cc is
    undefined below); all-integer — cc_micro = (2·tri·10⁶) DIV
    (deg·(deg−1)), no floats.

    Plan: one symmetrized degree aggregate (uniform edge-key
    exchange), ``triangle_counts`` (oriented wedge join — each
    triangle found exactly once), one uniform left join of triangles
    onto the degree spine (triangle-free nodes report 0).  Work is
    bounded by the wedge count of the ORIENTED graph (Σ out-deg² with
    out-degree capped by orientation — the standard scalable triangle
    plan, not the naive Σ deg²).
    """
    deg = (
        edges.select(F.col(src).alias("__v"))
        .unionAll(edges.select(F.col(dst).alias("__v")))
        .groupBy("__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    tri = triangle_counts(edges, src, dst).select(
        F.col("node").alias("__v"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
    )
    return (
        deg.where(F.col("degree") >= 2)
        .join(tri, "__v", "left")
        .select(
            F.col("__v").alias("node"),
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias(
                "n_triangles"
            ),
            F.expr(
                "CAST(coalesce(n_triangles, 0) * 2 * 1000000 AS DECIMAL(38,0))"
                " DIV CAST(degree * (degree - 1) AS DECIMAL(38,0))"
            )
            .cast("bigint")
            .alias("cc_micro"),
        )
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity of an undirected graph: the Pearson
    correlation of endpoint degrees over every edge endpoint pair
    (each undirected edge contributes both orientations — the standard
    Newman estimator).  Positive = hubs attach to hubs (a merged
    template family), negative = hubs attach to leaves (a star — one
    canonical doc with many near-copies); the single-number shape
    summary of a dup graph that node-level metrics can't give.

    Delegates the moment math to ``pearson_corr_exact`` (exact
    decimal(38,0) sums, fixed-IEEE final formula) over the
    degree-joined symmetric edge frame.  Output one row:
    ``(n_endpoint_pairs, n_nodes, n_edges, assort_r)`` — r NULL for
    degree-regular graphs (zero variance).

    Plan: one degree aggregate, two uniform joins hanging degrees on
    both endpoints (degree table is |V| rows — broadcast when small),
    ONE moment aggregate; the edge list never self-joins.
    """
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        pearson_corr_exact,
    )

    sym = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__t")
    ).unionAll(edges.select(F.col(dst).alias("__s"), F.col(src).alias("__t")))
    deg = sym.groupBy("__s").agg(
        F.count(F.lit(1)).cast("bigint").alias("__d")
    )
    # graph-size scalars ride the |V|-row degree frame (one tiny agg +
    # broadcast cross join), NOT driver .count()s — a lazy `edges`
    # (e.g. the LSH pair pipeline) would recompute per count otherwise
    # (the doc_pagerank lesson); pin `edges` at the call site anyway.
    sizes = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        (F.sum("__d") / 2).cast("bigint").alias("n_edges"),
    )
    joined = (
        sym.join(deg.withColumnRenamed("__d", "__ds"), "__s")
        .join(
            deg.select(
                F.col("__s").alias("__t"), F.col("__d").alias("__dt")
            ),
            "__t",
        )
    )
    r = pearson_corr_exact(
        joined, {"degree": F.col("__ds")}, F.col("__dt")
    )
    return r.crossJoin(F.broadcast(sizes)).select(
        F.col("n").alias("n_endpoint_pairs"),
        "n_nodes",
        "n_edges",
        F.col("r").alias("assort_r"),
    )


def link_prediction_scores(
    pairs: DataFrame,
    id_col_a: str = "doc_a",
    id_col_b: str = "doc_b",
    max_hub_degree: int = 1000,
) -> DataFrame:
    """Link-prediction features for NON-edges at distance 2: common-
    neighbor count and the resource-allocation index Σ_b 1/deg(b)
    over shared neighbors b — the standard "should these two nodes be
    connected?" scores (RA beats raw common-neighbors because a
    shared neighbor that touches everything is weak evidence).  On a
    dup-candidate graph this surfaces PAIRS THE BLOCKER MISSED: two
    docs sharing several near-dup neighbors but no direct edge are
    the transitive near-dups banding recall dropped.

    All-integer: RA accumulates floor(10⁶ / deg(b)) per wedge (each
    term exact, deterministic in any engine).  Output per candidate
    non-edge: ``(doc_a, doc_b, common_neighbors, ra_score_micro)``
    with doc_a < doc_b.

    Plan: degree aggregate, one wedge equi-join through the middle
    vertex (the only quadratic surface — bounded by Σ deg², with hubs
    above ``max_hub_degree`` EXCLUDED from the middle role, the
    standard RA hub cut that also caps wedge fan-out), one (a, c)
    groupBy, one left-anti join against the existing edge list.
    Never a cartesian product.
    """
    sym = pairs.select(
        F.col(id_col_a).alias("__s"), F.col(id_col_b).alias("__t")
    ).unionAll(
        pairs.select(F.col(id_col_b).alias("__s"), F.col(id_col_a).alias("__t"))
    )
    deg = sym.groupBy("__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__d")
    )
    mid = deg.where(F.col("__d") <= max_hub_degree)
    wedges = (
        sym.alias("e1")
        .join(mid.select(F.col("__t"), F.col("__d")), "__t")
        .join(
            sym.alias("e2").select(
                F.col("__s").alias("__t"), F.col("__t").alias("__c")
            ),
            "__t",
        )
        .where(F.col("__s") < F.col("__c"))
        .select(
            F.col("__s").alias("doc_a"),
            F.col("__c").alias("doc_b"),
            F.expr("1000000 DIV __d").cast("bigint").alias("__ra"),
        )
    )
    scored = wedges.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
        F.sum("__ra").cast("bigint").alias("ra_score_micro"),
    )
    existing = pairs.select(
        F.least(id_col_a, id_col_b).alias("doc_a"),
        F.greatest(id_col_a, id_col_b).alias("doc_b"),
    )
    return scored.join(existing, ["doc_a", "doc_b"], "left_anti")
