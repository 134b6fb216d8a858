"""Interval-interval overlap join: grid-candidate correctness."""

from __future__ import annotations

import pyspark.sql.functions as F


def _iv(spark, rows, id_name, s_name, e_name):
    return spark.createDataFrame(
        rows, f"user_id long, {id_name} long, s long, e long"
    ).select(
        "user_id",
        id_name,
        F.timestamp_seconds("s").alias(s_name),
        F.timestamp_seconds("e").alias(e_name),
    )


def test_overlap_join_semantics(spark):
    from dane_visual_feature_extraction_worker_spark.operators.intervals import (
        overlap_join,
    )

    cell = 100.0
    left = _iv(
        spark,
        [
            (1, 0, 50, 250),     # spans 3 cells
            (1, 1, 400, 410),
            (2, 2, 50, 60),      # same range, other entity
        ],
        "l_id", "l_start", "l_end",
    )
    right = _iv(
        spark,
        [
            (1, 10, 240, 300),   # overlaps l0 by [240,250]
            (1, 11, 250, 260),   # touches l0 at 250 (closed: overlap 0)
            (1, 12, 251, 300),   # just past l0's end -> no pair
            (1, 13, 0, 500),     # covers everything of user 1
            (2, 14, 55, 58),     # inside l2
        ],
        "r_id", "r_start", "r_end",
    )
    out = {
        (r["l_id"], r["r_id"]): r["overlap_us"]
        for r in overlap_join(
            left, right, entity="user_id", cell_seconds=cell
        ).collect()
    }
    assert out[(0, 10)] == 10_000_000
    assert out[(0, 11)] == 0  # closed intervals: touching counts, len 0
    assert (0, 12) not in out
    # wide interval pairs with both user-1 lefts; deduped to ONE row
    # each despite sharing many grid cells
    assert out[(0, 13)] == 200_000_000 and out[(1, 13)] == 10_000_000
    assert out[(2, 14)] == 3_000_000
    # entities never cross
    assert (2, 13) not in out and (0, 14) not in out
    assert len(out) == 5


def test_overlap_join_no_theta_join_in_plan(spark):
    from dane_visual_feature_extraction_worker_spark.operators.intervals import (
        overlap_join,
    )

    left = _iv(spark, [(1, 0, 0, 100)], "l_id", "l_start", "l_end")
    right = _iv(spark, [(1, 10, 50, 150)], "r_id", "r_start", "r_end")
    plan = (
        overlap_join(left, right, entity="user_id", cell_seconds=60.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # candidates come from the (entity, cell) equi-join; the overlap
    # predicate is a post-filter, never a nested-loop/cartesian join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
