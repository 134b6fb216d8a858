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
