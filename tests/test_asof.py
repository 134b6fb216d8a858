"""As-of join: both physical paths vs the brute-force pandas oracle,
including ties, empty right sides, and anchors before any event."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from dane_visual_feature_extraction_worker_spark.datagen import gen_anchors, gen_transcripts
from dane_visual_feature_extraction_worker_spark.operators.asof import (
    asof_join_rangejoin,
    asof_join_sorted,
    asof_join_union,
)
from tests.reference_impl import asof_join_ref


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_asof_paths_match_bruteforce(spark, transcripts, transcripts_pd):
    anchors = gen_anchors(spark, transcripts, per_conv=6)
    right = transcripts.select("conv_id", "ts", "turn_idx", "role")

    got_sorted = asof_join_sorted(
        anchors, right, on="conv_id", left_ts="anchor_ts", right_order="turn_idx"
    ).toPandas()
    got_union = asof_join_union(
        anchors, right, on="conv_id", left_ts="anchor_ts", right_order="turn_idx"
    ).toPandas()
    got_range = asof_join_rangejoin(
        anchors,
        right,
        on="conv_id",
        left_ts="anchor_ts",
        right_order="turn_idx",
        left_keys=["conv_id", "anchor_ts"],
    ).toPandas()

    ref = asof_join_ref(
        anchors.toPandas(),
        transcripts_pd[["conv_id", "ts", "turn_idx", "role"]],
        on="conv_id",
        left_ts="anchor_ts",
        right_ts="ts",
        right_order="turn_idx",
    )
    ref["turn_idx"] = ref["turn_idx"].astype("float64")
    for got in (got_sorted, got_range, got_union):
        g = _canon(got)
        g["turn_idx"] = g["turn_idx"].astype("float64")
        r = _canon(ref)[g.columns]
        pd.testing.assert_frame_equal(
            g.astype(str), r.astype(str), check_dtype=False
        )


def test_asof_zero_leakage(spark, transcripts):
    """No matched_ts may exceed its anchor — strict <= (north rule)."""
    anchors = gen_anchors(spark, transcripts, per_conv=6)
    out = asof_join_sorted(
        anchors,
        transcripts.select("conv_id", "ts", "turn_idx"),
        on="conv_id",
        left_ts="anchor_ts",
        right_order="turn_idx",
    )
    assert out.where(F.col("matched_ts") > F.col("anchor_ts")).count() == 0


def test_asof_empty_right_side(spark, transcripts):
    anchors = gen_anchors(spark, transcripts, per_conv=3)
    empty = transcripts.where(F.lit(False)).select("conv_id", "ts", "turn_idx")
    out = asof_join_sorted(
        anchors, empty, on="conv_id", left_ts="anchor_ts", right_order="turn_idx"
    )
    pdf = out.toPandas()
    assert len(pdf) == anchors.count()
    assert pdf["matched_ts"].isna().all()


def test_asof_tie_break_latest_order_wins(spark):
    """Duplicate right ts at the anchor: greatest right_order wins."""
    left = spark.createDataFrame(
        [("c", 100)], "conv_id string, anchor_ts long"
    ).select("conv_id", F.timestamp_seconds("anchor_ts").alias("anchor_ts"))
    right = spark.createDataFrame(
        [("c", 100, 1, "a"), ("c", 100, 2, "b"), ("c", 50, 3, "x")],
        "conv_id string, ts long, turn_idx int, v string",
    ).select("conv_id", F.timestamp_seconds("ts").alias("ts"), "turn_idx", "v")
    for fn, kw in (
        (asof_join_sorted, {}),
        (asof_join_union, {}),
        (asof_join_rangejoin, {"left_keys": ["conv_id", "anchor_ts"]}),
    ):
        row = fn(
            left, right, on="conv_id", left_ts="anchor_ts", right_order="turn_idx", **kw
        ).collect()[0]
        assert row["v"] == "b" and row["turn_idx"] == 2


def test_asof_union_empty_right_and_pure_jvm_plan(spark, transcripts):
    """Union path: empty right side yields all-null matches, and the
    executed plan has ZERO Python stages and ONE shuffle exchange."""
    anchors = gen_anchors(spark, transcripts, per_conv=3)
    empty = transcripts.where(F.lit(False)).select("conv_id", "ts", "turn_idx")
    out = asof_join_union(
        anchors, empty, on="conv_id", left_ts="anchor_ts", right_order="turn_idx"
    )
    pdf = out.toPandas()
    assert len(pdf) == anchors.count() and pdf["matched_ts"].isna().all()

    import re

    # truncate input lineage (gen_anchors aggregates transcripts, which
    # adds its own exchanges) so the count isolates the join itself
    a2 = anchors.localCheckpoint(eager=True)
    r2 = transcripts.select("conv_id", "ts", "turn_idx").localCheckpoint(eager=True)
    full = asof_join_union(
        a2, r2, on="conv_id", left_ts="anchor_ts", right_order="turn_idx"
    )
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Pandas|Python", plan)
    # both union children read the cached transcripts fixture; the only
    # exchange is the window's hash partitioning on the entity key
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_union_asof_tolerance_nulls_stale_matches(spark):
    """pandas merge_asof(tolerance) semantics: the anchor row survives
    but right columns null out when the latest match is too old."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.asof import (
        asof_join_union,
    )

    right = spark.createDataFrame(
        [("c1", 100.0, 7.0)], "conv_id string, sec double, payload double"
    ).select("conv_id", F.timestamp_seconds("sec").alias("ts"), "payload")
    left = spark.createDataFrame(
        [("c1", 150.0), ("c1", 2000.0)], "conv_id string, sec double"
    ).select("conv_id", F.timestamp_seconds("sec").alias("anchor_ts"))

    out = {
        r["anchor_ts"].timestamp(): r
        for r in asof_join_union(
            left, right, on="conv_id", left_ts="anchor_ts",
            tolerance_seconds=300.0,
        ).collect()
    }
    assert out[150.0]["payload"] == 7.0  # 50s stale: within tolerance
    assert out[2000.0]["payload"] is None  # 1900s stale: nulled
    assert out[2000.0]["matched_ts"] is None
    assert len(out) == 2  # anchors always survive


def test_asof_nearest_directions_and_ties(spark):
    """Hand-built cases: exact match wins backward at gap 0; strictly
    closer future row beats a farther past row; equidistant ties go
    BACKWARD; entities with only-future or only-past rows still match;
    no-candidate anchors get NULLs."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.asof import (
        asof_join_nearest,
    )

    def tbl(rows, cols):
        return spark.createDataFrame(rows, cols).select(
            *[c for c in cols.split(", ") if not c.startswith("sec")],
            F.timestamp_seconds("sec").alias("ts"),
        )

    left = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 100), (5, 100)],
        "k long, sec long",
    ).select("k", F.timestamp_seconds("sec").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, 100, 10),  # exact: gap 0 backward
            (1, 90, 11),
            (2, 97, 20),   # past, gap 3
            (2, 102, 21),  # future, gap 2 -> wins
            (3, 95, 30),   # equidistant gap 5
            (3, 105, 31),  # -> backward (30) wins
            (4, 130, 40),  # only future
        ],
        "k long, sec long, rid long",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "rid")
    out = {
        r["k"]: r
        for r in asof_join_nearest(
            left, right, on="k", right_order="rid"
        ).collect()
    }
    assert out[1]["rid"] == 10
    assert out[2]["rid"] == 21
    assert out[3]["rid"] == 30
    assert out[4]["rid"] == 40
    assert out[5]["rid"] is None and out[5]["matched_ts"] is None


def test_asof_forward_strict_and_tolerance(spark):
    """Next-event semantics: strictly-after (same-ts row is not a
    next event), earliest wins with least-order ties, tolerance
    nulls far matches, no-candidate anchors get NULLs."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.asof import (
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 100)], "k long, sec long"
    ).select("k", F.timestamp_seconds("sec").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, 100, 10),  # same ts: NOT a next event
            (1, 105, 11),  # -> winner for k=1
            (2, 103, 20),  # tie at earliest future instant:
            (2, 103, 21),  # least rid (20) wins
            (3, 9999, 30),  # beyond tolerance -> null
        ],
        "k long, sec long, rid long",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "rid")
    out = {
        r["k"]: r
        for r in asof_join_forward(
            left, right, on="k", right_order="rid", tolerance_seconds=60.0
        ).collect()
    }
    assert out[1]["rid"] == 11
    assert out[2]["rid"] == 20
    assert out[3]["rid"] is None
    assert out[4]["rid"] is None


def test_asof_salted_identical_to_plain_incl_empty_blocks(spark):
    """Block decomposition is invisible: identical rows to the plain
    union-window plan, including anchors whose own block has no right
    row (carry-in across an arbitrary gap of empty blocks) and ties
    inside one block."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.asof import (
        asof_join_salted,
        asof_join_union,
    )

    # right rows only in block 0; anchors stretch blocks 0..9 with a
    # long empty-block gap; duplicate right ts exercises the ord tie
    left = spark.createDataFrame(
        [(1, s) for s in (5, 50, 450, 900)] + [(2, 100)],
        "k long, sec long",
    ).select("k", F.timestamp_seconds("sec").alias("ts"))
    right = spark.createDataFrame(
        [(1, 10, 1), (1, 10, 2), (1, 40, 3)],
        "k long, sec long, rid long",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "rid")
    plain = sorted(
        map(tuple, asof_join_union(left, right, on="k", right_order="rid").collect())
    )
    salted = sorted(
        map(
            tuple,
            asof_join_salted(
                left, right, on="k", right_order="rid", block_seconds=100.0
            ).collect(),
        )
    )
    assert plain == salted
    by_sec = {int(r[1].timestamp()): r for r in salted}
    assert by_sec[5][3] is None           # before any right row
    assert by_sec[50][3] == 3             # in-block latest
    assert by_sec[450][3] == 3            # carry across empty blocks
    assert by_sec[900][3] == 3
    assert by_sec[100][3] is None         # other entity: no rights


def test_asof_routed_identical_both_paths(spark):
    """Routed == plain on a mix where one entity crosses the threshold
    (salted path) and the rest stay cold (plain path)."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.asof import (
        asof_join_routed,
        asof_join_union,
    )

    left = spark.range(600).select(
        F.when(F.col("id") < 500, 1).otherwise(F.col("id") % 5 + 2).alias("k"),
        F.timestamp_seconds(F.col("id") * 7).alias("ts"),
    )
    right = spark.range(200).select(
        F.when(F.col("id") < 150, 1).otherwise(F.col("id") % 5 + 2).alias("k"),
        F.timestamp_seconds(F.col("id") * 11 + 1).alias("ts"),
        F.col("id").alias("rid"),
    )
    plain = sorted(map(tuple, asof_join_union(left, right, on="k", right_order="rid").collect()))
    routed = sorted(
        map(
            tuple,
            asof_join_routed(
                left, right, on="k", right_order="rid",
                hot_threshold=100, block_seconds=500.0,
            ).collect(),
        )
    )
    assert plain == routed and len(plain) == 600
