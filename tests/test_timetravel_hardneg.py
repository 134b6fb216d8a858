"""CDC time-travel read semantics + hard-negative mining."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F


def _log(spark):
    rows = [
        # key 1: U then D before cut -> absent; resurrected AFTER cut
        (1, 10, "U", 1.0),
        (1, 20, "D", 0.0),
        (1, 90, "U", 9.0),
        # key 2: U, updated before cut -> latest pre-cut value
        (2, 11, "U", 1.0),
        (2, 30, "U", 3.0),
        (2, 80, "U", 8.0),
        # key 3: deleted only AFTER cut -> alive at the cut
        (3, 12, "U", 2.0),
        (3, 70, "D", 0.0),
        # key 4: first insert after cut -> absent
        (4, 60, "U", 6.0),
    ]
    return spark.createDataFrame(rows, "k long, seq long, op string, v double")


def test_time_travel_literal_cut(spark):
    from dane_visual_feature_extraction_worker_spark.operators.merge import (
        time_travel_read,
    )

    out = {
        r["k"]: r
        for r in time_travel_read(
            _log(spark), key_col="k", version_col="seq", op_col="op", as_of=40
        ).collect()
    }
    assert 1 not in out  # tombstone won at the cut
    assert out[2]["v"] == 3.0 and out[2]["seq"] == 30
    assert out[3]["v"] == 2.0  # delete happened after the cut
    assert 4 not in out  # not yet inserted
    # full-history read: resurrection visible, late delete applied
    full = {
        r["k"]: r
        for r in time_travel_read(
            _log(spark), key_col="k", version_col="seq", op_col="op",
            as_of=10_000,
        ).collect()
    }
    assert full[1]["v"] == 9.0 and 3 not in full


def test_time_travel_lazy_dataframe_cut(spark):
    from dane_visual_feature_extraction_worker_spark.operators.merge import (
        time_travel_read,
    )

    log = _log(spark)
    cut = log.agg(F.lit(40).alias("as_of"))
    got = {
        r["k"]: r["v"]
        for r in time_travel_read(
            log, key_col="k", version_col="seq", op_col="op", as_of=cut
        ).collect()
    }
    assert got == {2: 3.0, 3: 2.0}


def test_hard_negatives_masks_same_label_and_ranks(spark):
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        hard_negatives,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(size=(2, 6))
    rows = []
    for i in range(60):
        lab = i % 3
        v = base[lab % 2] + rng.normal(size=6) * 0.05
        rows.append((i, [float(x) for x in v], lab))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    queries = spark.createDataFrame(
        [(0, rows[0][1], 0)], "qid long, qe array<float>, qlabel int"
    )
    for parts in (1, 7):
        out = hard_negatives(
            emb.repartition(parts), queries, k=5
        ).orderBy("rank").collect()
        assert len(out) == 5
        assert all(r["neg_label"] != 0 for r in out)
        assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
        # ranks follow floored cosine desc, id asc
        keys = [(-r["cos"], r["vec_id"]) for r in out]
        assert keys == sorted(keys)
        # brute-force parity: the 5 best different-label cosines
        q = np.asarray(rows[0][1], dtype=np.float64)
        cand = []
        for vid, v, lab in rows:
            if lab == 0:
                continue
            x = np.asarray(v, dtype=np.float64)
            c = float(q @ x / (np.linalg.norm(q) * np.linalg.norm(x)))
            cand.append((-np.floor(c * 1e6) / 1e6, vid))
        expect = [vid for _, vid in sorted(cand)[:5]]
        assert [r["vec_id"] for r in out] == expect
