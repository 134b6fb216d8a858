"""clustering_coefficients / degree_assortativity batch."""

from __future__ import annotations

import math


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _brute_cc(pairs):
    """{node: (deg, tri, cc)} for deg >= 2."""
    from itertools import combinations

    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        tri = sum(1 for x, y in combinations(sorted(nb), 2) if y in adj[x])
        out[v] = (d, tri, (2 * tri * 10**6) // (d * (d - 1)))
    return out


def test_cc_triangle_plus_tail(spark):
    from dane_visual_feature_extraction_worker_spark.operators.graph import (
        clustering_coefficients,
    )

    # triangle 1-2-3, tail 3-4
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["cc_micro"])
        for r in clustering_coefficients(_edges(spark, pairs)).collect()
    }
    assert got == _brute_cc(pairs)
    assert got[1] == (2, 1, 1_000_000)      # fully clustered corner
    assert got[3] == (3, 1, 333_333)        # triangle + dangling tail
    assert 4 not in got                     # degree 1: cc undefined


def test_cc_square_has_no_triangles(spark):
    from dane_visual_feature_extraction_worker_spark.operators.graph import (
        clustering_coefficients,
    )

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1)]
    got = {
        r["node"]: (r["n_triangles"], r["cc_micro"])
        for r in clustering_coefficients(_edges(spark, pairs)).collect()
    }
    assert got == {v: (0, 0) for v in (1, 2, 3, 4)}


def test_cc_random_graph_matches_brute(spark):
    import random

    from dane_visual_feature_extraction_worker_spark.operators.graph import (
        clustering_coefficients,
    )

    rng = random.Random(7)
    pairs = sorted(
        {
            (a, b)
            for _ in range(60)
            for a, b in [sorted(rng.sample(range(14), 2))]
        }
    )
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["cc_micro"])
        for r in clustering_coefficients(_edges(spark, pairs)).collect()
    }
    assert got == _brute_cc(pairs)


def _brute_assort(pairs):
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in pairs:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    r = (n * sxy - sx * sy) / math.sqrt(vx * vy)
    return math.floor(r * 1e6) / 1e6


def test_assort_star_is_negative(spark):
    from dane_visual_feature_extraction_worker_spark.operators.graph import (
        degree_assortativity,
    )

    pairs = [(0, i) for i in range(1, 6)] + [(1, 2)]
    r = degree_assortativity(_edges(spark, pairs)).first()
    assert r["n_nodes"] == 6 and r["n_edges"] == 6
    assert r["n_endpoint_pairs"] == 12
    assert r["assort_r"] == _brute_assort(pairs)
    assert r["assort_r"] < 0  # hub-to-leaf star


def test_assort_regular_graph_is_null(spark):
    from dane_visual_feature_extraction_worker_spark.operators.graph import (
        degree_assortativity,
    )

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1)]  # 2-regular cycle
    r = degree_assortativity(_edges(spark, pairs)).first()
    assert r["assort_r"] is None  # zero degree variance


def test_assort_random_matches_brute(spark):
    import random

    from dane_visual_feature_extraction_worker_spark.operators.graph import (
        degree_assortativity,
    )

    rng = random.Random(3)
    pairs = sorted(
        {
            (a, b)
            for _ in range(40)
            for a, b in [sorted(rng.sample(range(12), 2))]
        }
    )
    r = degree_assortativity(_edges(spark, pairs)).first()
    assert r["assort_r"] == _brute_assort(pairs)
