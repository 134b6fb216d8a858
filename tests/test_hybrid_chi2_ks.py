"""RRF hybrid fusion, chi2 screening, KS drift, hashed bag-of-words."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_rrf_fuse_matches_reference_formula(spark):
    from dane_visual_feature_extraction_worker_spark.operators.retrieval import rrf_fuse

    # list A ranks ids 1,2,3; list B ranks 3,2,9 (scores pre-floored
    # to 1e-6 like the retrieval operators emit)
    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.5), (3, 0.1)], "id long, s double"
    )
    b = spark.createDataFrame(
        [(3, 7.0), (2, 2.0), (9, 1.0)], "id long, s double"
    )
    out = {
        r["id"]: r["rrf_micro"]
        for r in rrf_fuse([(a, "s", "id"), (b, "s", "id")], k=10).collect()
    }
    rr = lambda r: 1_000_000_000 // (60 + r)
    assert out == {
        1: rr(1),
        2: rr(2) + rr(2),
        3: rr(3) + rr(1),
        9: rr(3),
    }


def test_rrf_fuse_tie_break_and_k(spark):
    from dane_visual_feature_extraction_worker_spark.operators.retrieval import rrf_fuse

    # equal scores -> rank by ascending id; k truncates deterministically
    a = spark.createDataFrame(
        [(5, 1.0), (4, 1.0), (6, 1.0)], "id long, s double"
    )
    rows = rrf_fuse([(a, "s", "id")], k=2).collect()
    assert [r["id"] for r in rows] == [4, 5]
    assert rows[0]["rrf_micro"] == 1_000_000_000 // 61


def test_rrf_fuse_empty_raises(spark):
    import pytest

    from dane_visual_feature_extraction_worker_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_chi2_select_matches_scipy_formula(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import chi2_select

    # 12 users: 6 labeled (have an 'error' event). event 'x' appears
    # for 5 labeled + 1 unlabeled user; 'y' for 3 + 3.
    rows = []
    for u in range(12):
        labeled = u < 6
        rows.append((u, "view"))  # every user in the population
        if labeled:
            rows.append((u, "error"))
        if (labeled and u < 5) or u == 6:
            rows.append((u, "x"))
        if (labeled and u < 3) or (not labeled and u < 9):
            rows.append((u, "y"))
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {r["cat"]: r for r in chi2_select(ev).collect()}

    def ref(a, b, c, d):
        n = a + b + c + d
        det = a * d - b * c
        return math.floor(
            n * det * det / ((a + b) * (c + d) * (a + c) * (b + d)) * 1e6
        ) / 1e6

    x = out["x"]
    assert (x["a"], x["b"], x["c"], x["d"]) == (5, 1, 1, 5)
    assert x["chi2"] == ref(5, 1, 1, 5)
    y = out["y"]
    assert (y["a"], y["b"], y["c"], y["d"]) == (3, 3, 3, 3)
    assert y["chi2"] == ref(3, 3, 3, 3)
    # the label category is perfectly associated with itself: chi2 = N
    assert out["error"]["chi2"] == 12.0
    # 'view' covers everyone: c + d = 0 margin -> NULL, never a fake 0
    assert out["view"]["chi2"] is None


def test_ks_drift_matches_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import ks_drift

    # first half values skew low, second half high
    rows = []
    eid = 0
    vals1 = [1.00, 1.00, 2.50, 3.00, 4.00]
    vals2 = [2.50, 4.00, 5.00, 5.00, 6.25]
    for t, v in enumerate(vals1):
        rows.append((eid, t, v)); eid += 1
    for t, v in enumerate(vals2):
        rows.append((eid, 101 + t, v)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, epoch long, value double"
    ).select("event_id", F.timestamp_seconds("epoch").alias("ts"), "value")
    row = ks_drift(ev).collect()[0]
    assert (row["n1"], row["n2"]) == (5, 5)
    # brute-force D over the pooled grid
    c1 = [round(v * 100) for v in vals1]
    c2 = [round(v * 100) for v in vals2]
    grid = sorted(set(c1) | set(c2))
    d = max(
        abs(
            sum(1 for x in c1 if x <= g) / len(c1)
            - sum(1 for x in c2 if x <= g) / len(c2)
        )
        for g in grid
    )
    assert row["ks"] == math.floor(d * 1e6) / 1e6


def test_ks_drift_identical_halves_zero(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import ks_drift

    rows = [(i, i, float(i % 3)) for i in range(6)] + [
        (10 + i, 101 + i, float(i % 3)) for i in range(6)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, epoch long, value double"
    ).select("event_id", F.timestamp_seconds("epoch").alias("ts"), "value")
    assert ks_drift(ev).collect()[0]["ks"] == 0.0


def test_hashed_bow_signed_counts_and_bounds(spark):
    import hashlib

    from dane_visual_feature_extraction_worker_spark.operators.encoding import hashed_bow

    docs = spark.createDataFrame(
        [(0, ["alpha", "alpha", "beta"]), (1, ["beta"])],
        "doc_id long, toks array<string>",
    )
    out = hashed_bow(docs, F.col("toks"), n_buckets=256).collect()

    def ref(tok):
        hx = hashlib.md5(tok.encode()).hexdigest()
        return int(hx[:8], 16) % 256, 1 if hx[8] in "01234567" else -1

    ba, sa = ref("alpha")
    bb, sb = ref("beta")
    got = {(r["doc_id"], r["bucket"]): r["v"] for r in out}
    exp: dict[tuple[int, int], int] = {}
    for d, b, s in [(0, ba, 2 * sa), (0, bb, sb), (1, bb, sb)]:
        exp[(d, b)] = exp.get((d, b), 0) + s
    assert got == exp
    assert all(0 <= b < 256 for _, b in got)


def test_hashed_bow_collisions_cancel_by_sign(spark):
    """Two tokens in the same bucket with opposite signs must sum."""
    import hashlib

    from dane_visual_feature_extraction_worker_spark.operators.encoding import hashed_bow

    # find a same-bucket opposite-sign pair deterministically
    base = {}
    pair = None
    i = 0
    while pair is None:
        t = f"tok{i}"
        hx = hashlib.md5(t.encode()).hexdigest()
        b = int(hx[:8], 16) % 16
        s = 1 if hx[8] in "01234567" else -1
        if (b, -s) in base:
            pair = (base[(b, -s)], t, b)
        else:
            base.setdefault((b, s), t)
        i += 1
    t1, t2, b = pair
    docs = spark.createDataFrame(
        [(0, [t1, t2])], "doc_id long, toks array<string>"
    )
    out = hashed_bow(docs, F.col("toks"), n_buckets=16).collect()
    got = {(r["doc_id"], r["bucket"]): r["v"] for r in out}
    assert got[(0, b)] == 0


def test_null_inputs_excluded_consistently(spark):
    """NULL scores/values/timestamps/categories are excluded, not
    grouped — the engine-divergent NULL-ordering class (Spark windows
    put NULLS FIRST, DuckDB NULLS LAST) can never reach a window."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        auc_exact,
        chi2_select,
        ks_drift,
    )
    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        burst_windows,
    )

    ev = spark.createDataFrame(
        [
            (0, 1, 0, 1.0, "view"),
            (1, 1, 60, None, "view"),       # null value
            (2, 2, None, 2.0, "click"),     # null ts
            (3, 2, 120, 3.0, None),         # null category
            (4, 3, 180, 4.0, "error"),
        ],
        "event_id long, user_id long, epoch long, value double, "
        "event_type string",
    ).select(
        "event_id", "user_id",
        F.timestamp_seconds("epoch").alias("ts"), "value", "event_type",
    )
    row = ks_drift(ev).collect()[0]
    assert row["n1"] + row["n2"] == 4  # null value dropped
    a = auc_exact(
        ev, (F.col("value") * 100).cast("bigint"),
        F.when(F.col("event_type") == "error", 1).otherwise(0),
    ).collect()[0]
    assert a["pos"] + a["neg"] == 4
    b = burst_windows(ev).collect()
    assert all(r["win"] is not None for r in b)
    assert sum(r["cnt"] for r in b) == 4  # null ts dropped
    cats = {r["cat"] for r in chi2_select(ev).collect()}
    assert None not in cats and cats == {"view", "click", "error"}
