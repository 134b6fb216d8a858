"""Feature-screening batch: near-zero-variance + duplicate columns."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_nzv_report_three_arms(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import nzv_report

    rows = [(i,) for i in range(100)]
    df = spark.createDataFrame(rows, "i long")
    out = nzv_report(
        df,
        features={
            # constant: single value -> NULL ratio, NZV
            "const": F.lit("c"),
            # near-constant: 99x 'a', 1x 'b' -> ratio 99 > 19, NZV
            "nearconst": F.when(F.col("i") == 0, "b").otherwise("a"),
            # healthy: 2 values 50/50 -> ratio 1, unique 2% -> not NZV
            "balanced": (F.col("i") % 2).cast("string"),
            # high-cardinality id: unique share 100% -> not NZV
            "id": F.col("i").cast("string"),
        },
    )
    got = {r["feature"]: r for r in out.collect()}
    assert got["const"]["nzv"] and got["const"]["freq_ratio_micro"] is None
    assert got["nearconst"]["nzv"]
    assert got["nearconst"]["freq_ratio_micro"] == 99 * 1_000_000 // 1
    assert not got["balanced"]["nzv"]
    assert got["balanced"]["freq_ratio_micro"] == 1_000_000
    assert not got["id"]["nzv"]
    assert got["id"]["unique_micro"] == 1_000_000
    with pytest.raises(ValueError):
        nzv_report(df, features={})


def test_identical_features_nullsafe(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        identical_features,
    )

    rows = [(1, 1, None), (2, 2, None), (3, 9, 3)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    out = identical_features(
        df, features={"a": F.col("a"), "b": F.col("b"), "c": F.col("c")}
    )
    got = {(r["feat_a"], r["feat_b"]): r for r in out.collect()}
    ab = got[("a", "b")]
    assert (ab["n_diff"], ab["identical"]) == (1, False)
    ac = got[("a", "c")]
    # NULL-safe: (1, NULL) and (2, NULL) differ, (3, 3) equal -> 2
    assert ac["n_diff"] == 2
    with pytest.raises(ValueError):
        identical_features(df, features={"a": F.col("a")})


def test_identical_features_true_duplicate(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        identical_features,
    )

    df = spark.createDataFrame([(1,), (2,), (None,)], "x int")
    out = identical_features(
        df, features={"x1": F.col("x"), "x2": F.col("x") * 1}
    ).collect()[0]
    assert out["identical"] and out["n_diff"] == 0  # NULL == NULL
