"""Z-order layout keys, triangle counting, Bloom join prune, Pareto
frontier — the round-5 layout/graph/join-prune batch."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F


def _zref(xs, ys, bits=16):
    """Driver-side reference Morton keys (exact integer math)."""
    xlo, xhi = min(xs), max(xs)
    ylo, yhi = min(ys), max(ys)
    xq = (xhi - xlo) // (1 << bits) + 1
    yq = (yhi - ylo) // (1 << bits) + 1
    out = []
    for x, y in zip(xs, ys):
        xb, yb = (x - xlo) // xq, (y - ylo) // yq
        z = 0
        for i in range(bits):
            z += ((xb >> i) & 1) << (2 * i)
            z += ((yb >> i) & 1) << (2 * i + 1)
        out.append(z)
    return out


def test_zorder_matches_reference_and_bounds(spark):
    from dane_visual_feature_extraction_worker_spark.operators.layout import (
        zorder_layout,
    )

    rng = np.random.default_rng(7)
    # epoch-microsecond-scale x domain: the overflow trap the DIV-first
    # bucketing exists to avoid
    xs = [int(v) for v in rng.integers(1_700_000_000_000_000,
                                       1_760_000_000_000_000, 300)]
    ys = [int(v) for v in rng.integers(0, 10_000, 300)]
    df = spark.createDataFrame(
        [(i, xs[i], ys[i]) for i in range(300)], "rid long, x long, y long"
    )
    got = {
        r["rid"]: r["zkey"]
        for r in zorder_layout(df, "x", "y", bits=16).collect()
    }
    ref = _zref(xs, ys)
    assert [got[i] for i in range(300)] == ref
    assert all(0 <= z < (1 << 32) for z in ref)


def test_zorder_locality(spark):
    """Rows identical in both dims share a key; the key is monotone in
    each dim when the other is fixed at bucket granularity."""
    from dane_visual_feature_extraction_worker_spark.operators.layout import (
        zorder_layout,
    )

    df = spark.createDataFrame(
        [(i, i * 100, 5) for i in range(64)], "rid long, x long, y long"
    )
    rows = sorted(
        zorder_layout(df, "x", "y", bits=6).collect(),
        key=lambda r: r["rid"],
    )
    ks = [r["zkey"] for r in rows]
    assert ks == sorted(ks)  # y fixed -> key monotone in x


def test_triangle_counts_known_graphs(spark):
    from dane_visual_feature_extraction_worker_spark.operators.graph import (
        triangle_counts,
    )

    # K4: 4 triangles, each node on 3 of them
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = spark.createDataFrame(k4, "src long, dst long")
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    # chain 0-1-2-3: no triangles
    chain = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    assert triangle_counts(chain).count() == 0

    # two triangles sharing edge (1,2): nodes 1,2 in two each
    bowtie = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    out = {
        r["node"]: r["n_triangles"] for r in triangle_counts(bowtie).collect()
    }
    assert out == {0: 1, 1: 2, 2: 2, 3: 1}


def test_triangle_partition_invariance(spark):
    from dane_visual_feature_extraction_worker_spark.operators.graph import (
        triangle_counts,
    )

    rng = np.random.default_rng(3)
    edges = {
        (int(a), int(b))
        for a, b in rng.integers(0, 40, size=(300, 2))
        if a < b
    }
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    a = sorted(map(tuple, triangle_counts(e).collect()))
    b = sorted(map(tuple, triangle_counts(e.repartition(13)).collect()))
    assert a == b and len(a) > 0


def test_bloom_join_equals_plain_join(spark):
    from dane_visual_feature_extraction_worker_spark.operators.joins import (
        bloom_join_prune,
    )

    rng = np.random.default_rng(11)
    fact = spark.createDataFrame(
        [(int(k), i) for i, k in enumerate(rng.integers(0, 500, 2000))],
        "fk long, payload long",
    )
    dim = spark.createDataFrame(
        [(int(k), f"d{k}") for k in range(0, 500, 7)], "dk long, name string"
    )
    got = sorted(
        map(
            tuple,
            bloom_join_prune(fact, dim, "fk", "dk", m_bits=1024, k_hashes=3)
            .select("fk", "payload", "name")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            fact.join(dim, fact["fk"] == dim["dk"])
            .select("fk", "payload", "name")
            .collect(),
        )
    )
    assert got == want and len(want) > 0

    # empty dim -> empty bloom word array -> nothing survives the prune
    empty = dim.where(F.lit(False))
    assert bloom_join_prune(fact, empty, "fk", "dk", m_bits=1024).count() == 0


def test_pareto_frontier_semantics(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        pareto_frontier,
    )

    rows = [
        # (id, grp, x=maximize, y=minimize)
        (0, "a", 10, 5),
        (1, "a", 10, 5),   # exact duplicate of the frontier point: kept
        (2, "a", 10, 7),   # same x, worse y: dominated
        (3, "a", 12, 9),   # frontier (best x)
        (4, "a", 8, 3),    # frontier (best y)
        (5, "a", 9, 5),    # dominated by id 0 (x strict)
        (6, "a", 12, 10),  # dominated by id 3 (y strict, x tie)
        (7, "b", 1, 1),    # other group: alone, frontier
    ]
    df = spark.createDataFrame(rows, "rid long, grp string, x int, y int")
    got = sorted(
        r["rid"]
        for r in pareto_frontier(df, "x", "y", group="grp").collect()
    )
    assert got == [0, 1, 3, 4, 7]


def test_pareto_matches_bruteforce(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        pareto_frontier,
    )

    rng = np.random.default_rng(21)
    pts = [(i, int(x), int(y)) for i, (x, y) in enumerate(
        rng.integers(0, 30, size=(200, 2)))]
    df = spark.createDataFrame(pts, "rid long, x int, y int")
    got = sorted(
        r["rid"] for r in pareto_frontier(df, "x", "y").collect()
    )
    want = sorted(
        i
        for i, x, y in pts
        if not any(
            (xj >= x and yj <= y and (xj > x or yj < y))
            for _, xj, yj in pts
        )
    )
    assert got == want


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_pareto_plan_one_sort_no_join(spark):
    """Skyline plan: two windows over ONE sort exchange, no join
    operator anywhere (the dominance self-join is exactly what this
    operator exists to avoid)."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        pareto_frontier,
    )

    df = spark.range(1000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 50).cast("int").alias("x"),
        (F.col("id") % 37).cast("int").alias("y"),
    )
    plan = _plan(pareto_frontier(df, "x", "y"))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_bloom_prune_filter_before_join(spark):
    """The bit-array probe must be a plain Filter on the fact side
    (pure codegen — no Python eval, no extra scan of dim in the fact
    branch), below the join."""
    from dane_visual_feature_extraction_worker_spark.operators.joins import (
        bloom_join_prune,
    )

    fact = spark.range(5000).select(
        (F.col("id") % 700).alias("fk"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 700, 9).select(
        F.col("id").alias("dk"), (F.col("id") * 10).alias("attr")
    )
    plan = _plan(bloom_join_prune(fact, dim, "fk", "dk", m_bits=1024))
    assert "Filter" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_zorder_no_python_and_range_partitioned(spark):
    """Morton key is shift/add codegen (no UDF); the layout is one
    range exchange."""
    from dane_visual_feature_extraction_worker_spark.operators.layout import (
        zorder_layout,
    )

    df = spark.range(2000).select(
        F.col("id").alias("rid"),
        (F.col("id") * 977).alias("x"),
        (F.col("id") % 631).alias("y"),
    )
    plan = _plan(zorder_layout(df, "x", "y", bits=12))
    assert "rangepartitioning" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_triangle_no_cartesian(spark):
    from dane_visual_feature_extraction_worker_spark.operators.graph import (
        triangle_counts,
    )

    e = spark.createDataFrame(
        [(a, b) for a in range(12) for b in range(a + 1, 12)],
        "src long, dst long",
    )
    plan = _plan(triangle_counts(e))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
