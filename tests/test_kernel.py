"""Feature kernel: hand-computed values, golden parity, zero leakage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from dane_visual_feature_extraction_worker_spark.kernel import (
    FEATURE_DIM,
    compute_features_pd,
)
from dane_visual_feature_extraction_worker_spark.plans.pipeline import pit_features_array as pit_features
from tests.reference_impl import features_ref, sort_transcripts


def _tiny_conv() -> pd.DataFrame:
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:10", "2024-01-01 01:00:00"]
    )
    return pd.DataFrame(
        {
            "conv_id": ["c"] * 3,
            "turn_idx": np.array([0, 1, 2], dtype="int32"),
            "role": ["user", "assistant", "user"],
            "text": ["hello world", "", "bye"],
            "tool": [None, "search", None],
            "ts": ts,
        }
    )


def test_kernel_hand_computed():
    out = compute_features_pd(_tiny_conv())
    f = np.stack(out["features"].to_numpy())
    assert f.shape == (3, FEATURE_DIM)
    # f0: turns so far
    assert list(f[:, 0]) == [1.0, 2.0, 3.0]
    # f1 cum chars: 11, 11, 14 ; f3 chars this turn
    assert list(f[:, 1]) == [11.0, 11.0, 14.0]
    assert list(f[:, 3]) == [11.0, 0.0, 3.0]
    # f4 gaps: 0, 10, 3590
    assert list(f[:, 4]) == [0.0, 10.0, 3590.0]
    # session boundary: 3590 > 1800 -> sessions [0, 0, 1]
    assert list(out["session_id"]) == [0, 0, 1]
    # role one-hot cumulative: user counts f8 = 1,1,2
    assert list(f[:, 8]) == [1.0, 1.0, 2.0]
    # tool calls so far f12 = 0,1,1
    assert list(f[:, 12]) == [0.0, 1.0, 1.0]
    # turns in session f13 = 1,2,1 ; secs in session f14 = 0,10,0
    assert list(f[:, 13]) == [1.0, 2.0, 1.0]
    assert list(f[:, 14]) == [0.0, 10.0, 0.0]
    # hashed bag is l2-normalized when text nonempty
    assert abs(np.linalg.norm(f[0, 16:]) - 1.0) < 1e-6
    assert np.linalg.norm(f[1, 16:]) == 0.0


def test_kernel_distributed_matches_reference(transcripts, transcripts_pd):
    got = pit_features(transcripts).toPandas()
    got = got.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    ref = features_ref(sort_transcripts(transcripts_pd))
    ref = ref.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    # keys + text-order invariants: exact (feature_extraction_test.py:56)
    pd.testing.assert_series_equal(got["conv_id"], ref["conv_id"])
    pd.testing.assert_series_equal(
        got["turn_idx"].astype("int64"), ref["turn_idx"].astype("int64")
    )
    assert (got["session_id"].to_numpy() == ref["session_id"].to_numpy()).all()
    # features: allclose (feature_extraction_test.py:58-60)
    gf = np.stack(got["features"].to_numpy())
    rf = np.stack(ref["features"].to_numpy())
    assert gf.shape == rf.shape == (len(ref), FEATURE_DIM)
    assert np.allclose(gf, rf, rtol=1e-6, atol=1e-6)
    # kernel-computed session bounds == groupby min/max of ts
    bounds = (
        got.groupby(["conv_id", "session_id"])
        .agg(lo=("ts", "min"), hi=("ts", "max"))
        .reset_index()
    )
    g1 = got.merge(bounds, on=["conv_id", "session_id"])
    assert (g1["session_start"] == g1["lo"]).all()
    assert (g1["session_end"] == g1["hi"]).all()


def test_zero_temporal_leakage(spark, transcripts, transcripts_pd):
    """Perturb/remove everything after an anchor: features at and before
    the anchor must be bit-identical (north rule)."""
    t = sort_transcripts(transcripts_pd)
    conv = t["conv_id"].iloc[0]
    g = t[t["conv_id"] == conv]
    anchor = g["ts"].iloc[len(g) // 2]

    full = compute_features_pd(g)
    truncated = compute_features_pd(g[g["ts"] <= anchor])
    n = len(truncated)
    ff = np.stack(full["features"].to_numpy())[:n]
    tf = np.stack(truncated["features"].to_numpy())
    assert (ff == tf).all()  # bit-identical, not just allclose

    # and through the distributed path: mutate future rows wildly
    mutated = transcripts.withColumn(
        "text",
        F.when(F.col("ts") > F.lit(anchor), F.lit("LEAKED " * 50)).otherwise(
            F.col("text")
        ),
    ).withColumn(
        "role",
        F.when(F.col("ts") > F.lit(anchor), F.lit("system")).otherwise(F.col("role")),
    )
    base = (
        pit_features(transcripts)
        .where((F.col("conv_id") == conv) & (F.col("ts") <= F.lit(anchor)))
        .toPandas()
        .sort_values(["ts", "turn_idx"])
        .reset_index(drop=True)
    )
    mut = (
        pit_features(mutated)
        .where((F.col("conv_id") == conv) & (F.col("ts") <= F.lit(anchor)))
        .toPandas()
        .sort_values(["ts", "turn_idx"])
        .reset_index(drop=True)
    )
    bf = np.stack(base["features"].to_numpy())
    mf = np.stack(mut["features"].to_numpy())
    assert (bf == mf).all()


def test_per_turn_text_equality_under_stable_order(transcripts, transcripts_pd):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering between engine and reference."""
    got = (
        transcripts.orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    ref = transcripts_pd.sort_values(["conv_id", "turn_idx"], kind="mergesort")[
        ["conv_id", "turn_idx", "text"]
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)


def test_window_strategy_bit_identical_and_pure_jvm(transcripts):
    """The pure-Catalyst window plan (r2 scale path) must reproduce the
    Arrow kernel's float32 output BIT-FOR-BIT (same sequential double
    arithmetic in the same order) with zero Python stages and one
    exchange."""
    import re

    from dane_visual_feature_extraction_worker_spark.plans.pipeline import (
        pit_features,
    )

    a = (
        pit_features(transcripts, strategy="pandas")
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    b = (
        pit_features(transcripts, strategy="windows")
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert (av == bv).all(), f"column {c} differs"

    src = transcripts.localCheckpoint(eager=True)
    plan = (
        pit_features(src, strategy="windows")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not re.search(r"Pandas|Python", plan)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_unicode_whitespace_tokenizer_matches_sql_oracle(spark):
    """ADVICE r4 closure: the engine tokenizes with Java's (?U)\\s; the
    DuckDB oracle spells the same set as an explicit Unicode
    White_Space class (RE2 \\s is ASCII-only). Exotic-whitespace text -
    NBSP, LINE SEPARATOR, IDEOGRAPHIC SPACE, NEL - must produce
    identical f15 (words) and f16-31 (md5-nibble bag) on both engines,
    not just on the ASCII testdata."""
    import duckdb

    from dane_visual_feature_extraction_worker_spark.kernel import (
        feature_vectors_windows,
    )
    from dane_visual_feature_extraction_worker_spark.plans.driver_queries import (
        _CRC32_SQL,
        _WS_CLASS,
        _crc32_table,
        _f32,
    )

    texts = [
        "plain ascii words",
        "nbsp\u00a0separated\u00a0tokens",
        "line\u2028sep and\u2029para",
        "ideographic\u3000space\u3000here",
        "nel\u0085break tab\tmix \u200a hair",
        "",
        " \u00a0\u3000",  # whitespace-only -> zero words
    ]
    ts = pd.date_range("2024-01-01", periods=len(texts), freq="10s")
    pdf = pd.DataFrame(
        {
            "conv_id": ["u"] * len(texts),
            "turn_idx": np.arange(len(texts), dtype="int32"),
            "role": ["user"] * len(texts),
            "text": texts,
            "tool": [None] * len(texts),
            "ts": ts,
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        feature_vectors_windows(df)
        .select("turn_idx", "f15", *[f"f{i}" for i in range(16, 32)])
        .toPandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("t", pdf[["turn_idx", "text"]])
    bag = ",\n".join(
        _f32(f"CASE WHEN norm > 0 THEN CAST(c{b} AS DOUBLE)/norm ELSE 0.0 END")
        + f" AS f{16 + b}"
        for b in range(16)
    )
    counts = ",".join(
        f"len(list_filter(hs, h -> h = {b})) AS c{b}" for b in range(16)
    )
    norm_sq = " + ".join(f"c{b}*c{b}" for b in range(16))
    ref = con.sql(
        f"""
        WITH c(tbl) AS (SELECT {_crc32_table()}),
        tk AS (
          SELECT turn_idx,
                 list_filter(regexp_split_to_array(text, '{_WS_CLASS}'),
                             x -> x <> '') AS toks
          FROM t
        ), hk AS (
          SELECT turn_idx, len(toks) AS words,
                 list_transform(
                   list_transform(toks, t -> lower(hex(encode(t)))),
                   hx -> {_CRC32_SQL}
                 ) AS hs
          FROM tk, c
        ), ck AS (SELECT turn_idx, words, {counts} FROM hk),
        nk AS (SELECT *, sqrt(CAST({norm_sq} AS DOUBLE)) AS norm FROM ck)
        SELECT turn_idx, {_f32("words")} AS f15, {bag}
        FROM nk ORDER BY turn_idx
        """
    ).fetchdf()

    assert (got["f15"].to_numpy().astype("float64") == ref["f15"].to_numpy()).all()
    for b in range(16, 32):
        g = got[f"f{b}"].to_numpy().astype("float64")
        r = ref[f"f{b}"].to_numpy()
        assert (g == r).all(), f"f{b} diverges on unicode whitespace"
