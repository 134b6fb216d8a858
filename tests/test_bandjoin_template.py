"""band_join / template_contamination batch."""

from __future__ import annotations

import pyspark.sql.functions as F


def _bj(spark, lrows, rrows, eps, on=("k",)):
    from dane_visual_feature_extraction_worker_spark.operators.joins import (
        band_join,
    )

    l = spark.createDataFrame(lrows, "k long, v long")
    r = spark.createDataFrame(rrows, "k long, v long")
    return band_join(
        l, r, on=list(on),
        left_val=F.col("v"), right_val=F.col("v"),
        eps=eps, left_cols=[], right_cols=[],
    )


def _brute(lrows, rrows, eps):
    return sorted(
        (lk, lv, rv)
        for lk, lv in lrows
        for rk, rv in rrows
        if lk == rk and abs(lv - rv) <= eps
    )


def test_band_join_matches_brute(spark):
    lrows = [(1, 0), (1, 10), (1, 25), (2, 100), (2, -7)]
    rrows = [(1, 5), (1, 19), (2, 95), (2, -17), (3, 0)]
    got = sorted(
        (r["k"], r["left_val"], r["right_val"])
        for r in _bj(spark, lrows, rrows, eps=10).collect()
    )
    assert got == _brute(lrows, rrows, 10)


def test_band_join_boundary_inclusive(spark):
    got = _bj(spark, [(1, 0)], [(1, 10), (1, 11)], eps=10).collect()
    assert len(got) == 1 and got[0]["right_val"] == 10


def test_band_join_negative_values_across_zero(spark):
    # pairs straddling zero where trunc-DIV bucketing is trickiest
    lrows = [(1, -1), (1, 9), (1, -9)]
    rrows = [(1, -11), (1, 1), (1, -19)]
    got = sorted(
        (r["left_val"], r["right_val"])
        for r in _bj(spark, lrows, rrows, eps=10).collect()
    )
    assert got == sorted(
        (lv, rv)
        for _, lv in lrows for _, rv in rrows
        if abs(lv - rv) <= 10
    )


def test_band_join_no_duplicate_pairs(spark):
    out = _bj(spark, [(1, 5)], [(1, 5)], eps=10).collect()
    assert len(out) == 1  # exactly one bucket produces the match


def test_band_join_bad_eps(spark):
    import pytest

    with pytest.raises(ValueError):
        _bj(spark, [(1, 0)], [(1, 0)], eps=0)


def test_template_contamination_families(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        template_contamination,
    )

    docs = spark.createDataFrame(
        [
            ("s", "plain prose about nothing"),
            ("s", "<|im_start|>user hello<|im_end|>"),
            ("s", "[INST] do the thing [/INST] sure"),
            ("s", "### Instruction\nsummarize\n### Response\nok"),
            ("s", "Human: hi\nAssistant: hello"),
            ("s", None),
        ],
        "source string, text string",
    )
    r = template_contamination(docs).first()
    assert r["n_docs"] == 6
    assert r["n_chatml"] == 1 and r["n_inst"] == 1
    assert r["n_alpaca"] == 1 and r["n_turns"] == 1
    assert r["n_contaminated"] == 4
    assert r["contaminated_share_micro"] == 666_666
