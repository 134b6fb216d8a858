"""k-core peeling batch."""

from __future__ import annotations

import pytest


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _brute_kcore(edges, nodes, k):
    """Reference peel: returns {node: rounds_survived or None}."""
    alive = set(nodes)
    out = {}
    rounds = 0
    while True:
        deg = {n: 0 for n in alive}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        fall = {n for n in alive if deg[n] < k}
        if not fall:
            break
        for n in fall:
            out[n] = rounds
        alive -= fall
        rounds += 1
    for n in alive:
        out[n] = None
    return out


def test_kcore_triangle_with_tail(spark):
    from dane_visual_feature_extraction_worker_spark.operators.graph import kcore_peel

    # triangle 1-2-3 with a chain 3-4-5 and an isolated node 6
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    nodes = [1, 2, 3, 4, 5, 6]
    got = {
        r["doc_id"]: (r["rounds_survived"], r["in_kcore"])
        for r in kcore_peel(_pairs(spark, edges), _nodes(spark, nodes), k=2).collect()
    }
    want = _brute_kcore(edges, nodes, 2)
    assert len(got) == len(nodes)
    for n, rs in want.items():
        assert got[n] == (rs, rs is None), (n, got[n], rs)
    # concretely: the triangle is the 2-core, 5 and 6 fall at round 0,
    # 4 falls at round 1 (it kept degree 2 until 5 was peeled)
    assert got[4] == (1, False)
    assert got[5] == (0, False)
    assert got[6] == (0, False)
    assert got[1] == (None, True)


def test_kcore_random_brute_force(spark):
    import random

    from dane_visual_feature_extraction_worker_spark.operators.graph import kcore_peel

    rng = random.Random(7)
    nodes = list(range(40))
    edges = sorted(
        {
            (a, b)
            for a, b in (
                sorted(rng.sample(nodes, 2)) for _ in range(90)
            )
        }
    )
    for k in (2, 3):
        got = {
            r["doc_id"]: r["rounds_survived"]
            for r in kcore_peel(
                _pairs(spark, edges), _nodes(spark, nodes), k=k
            ).collect()
        }
        want = _brute_kcore(edges, nodes, k)
        assert got == want, f"k={k}"


def test_kcore_empty_graph_and_validation(spark):
    from dane_visual_feature_extraction_worker_spark.operators.graph import kcore_peel

    got = kcore_peel(
        _pairs(spark, []), _nodes(spark, [1, 2]), k=2
    ).collect()
    assert all(r["rounds_survived"] == 0 and not r["in_kcore"] for r in got)
    with pytest.raises(ValueError):
        kcore_peel(_pairs(spark, []), _nodes(spark, [1]), k=0)


def test_kcore_nonconvergence_raises(spark):
    from dane_visual_feature_extraction_worker_spark.operators.graph import kcore_peel

    # a 6-chain peels from both ends: 3 rounds needed; cap at 2 raises
    edges = [(i, i + 1) for i in range(1, 6)]
    with pytest.raises(RuntimeError):
        kcore_peel(
            _pairs(spark, edges), _nodes(spark, list(range(1, 7))), k=2, max_iters=2
        ).collect()
