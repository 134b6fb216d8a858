"""BM25 retrieval, edit-distance-1 dedup, Markov transitions,
incremental rollup merge — the round-5 retrieval/maintenance batch."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F


def _bm25_ref(docs: dict[int, list[str]], terms: list[str], k=10):
    """Driver-side reference replaying the integer micro-score math."""
    n = len(docs)
    tl = sum(len(t) for t in docs.values())
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in terms
    }
    scores = {}
    for d, toks in docs.items():
        micro = 0
        hit = False
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            hit = True
            idf = math.floor(math.log(2 * n + 2) * 1e6) - math.floor(
                math.log(2 * df[t] + 1) * 1e6
            )
            num = 22 * tf * tl
            den = 10 * tf * tl + 3 * tl + 9 * len(toks) * n
            micro += math.floor(float(idf * num) / float(den))
        if hit:
            scores[d] = micro
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, m / 1e6) for d, m in top]


def test_bm25_matches_reference(spark):
    from dane_visual_feature_extraction_worker_spark.operators.retrieval import (
        bm25_topk,
    )

    rng = np.random.default_rng(5)
    vocab = ["scan", "merge", "sort", "join", "key", "row", "agg"]
    docs = {
        i: [vocab[j] for j in rng.integers(0, len(vocab), rng.integers(3, 30))]
        for i in range(60)
    }
    df = spark.createDataFrame(
        [(i, toks) for i, toks in docs.items()],
        "doc_id long, toks array<string>",
    )
    got = [
        (r["doc_id"], r["bm25"])
        for r in bm25_topk(df, F.col("toks"), ["scan", "merge"], k=10).collect()
    ]
    assert got == _bm25_ref(docs, ["scan", "merge"], k=10)


def test_bm25_ranks_relevance(spark):
    """A doc stuffed with the query term outranks one that mentions it
    once; a doc without it never appears."""
    from dane_visual_feature_extraction_worker_spark.operators.retrieval import (
        bm25_topk,
    )

    df = spark.createDataFrame(
        [
            (1, ["scan"] * 8 + ["pad"] * 2),
            (2, ["scan"] + ["pad"] * 9),
            (3, ["pad"] * 10),
        ],
        "doc_id long, toks array<string>",
    )
    rows = bm25_topk(df, F.col("toks"), ["scan"], k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids == [1, 2]
    assert rows[0]["bm25"] > rows[1]["bm25"] > 0


def test_edit1_pairs_vs_bruteforce(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        edit1_pairs,
    )

    rng = np.random.default_rng(9)
    base = ["abcdef", "abcdeg", "abcde", "abcdex", "zbcdef", "qwerty",
            "qwertz", "qwert", "xyz", "xyzz"]
    rows = [(i, base[rng.integers(0, len(base))]) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[n]

    want = sorted(
        (a, b, lev(ta[:12], tb[:12]))
        for (a, ta) in rows
        for (b, tb) in rows
        if a < b and lev(ta[:12], tb[:12]) <= 1
    )
    got = sorted(
        map(
            tuple,
            edit1_pairs(df, F.col("text"), key_len=12).collect(),
        )
    )
    assert got == want and len(want) > 0


def test_edit1_no_cartesian(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        edit1_pairs,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc"), (F.col("id") % 40).cast("string")).alias("text"),
    )
    plan = (
        edit1_pairs(df, F.col("text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_transition_matrix_known(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        transition_matrix,
    )

    # user 1: a b a b a ; user 2: a a c
    rows = [
        (1, 1, 10, "a"), (2, 1, 20, "b"), (3, 1, 30, "a"),
        (4, 1, 40, "b"), (5, 1, 50, "a"),
        (6, 2, 10, "a"), (7, 2, 20, "a"), (8, 2, 30, "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, tsec long, event_type string"
    ).select(
        "event_id", "user_id",
        F.timestamp_seconds("tsec").alias("ts"), "event_type",
    )
    got = {
        (r["src_state"], r["dst_state"]): (r["n_trans"], r["prob"])
        for r in transition_matrix(df).collect()
    }
    # from a: ->b twice, ->a once, ->c once (4 total)
    assert got[("a", "b")] == (2, 0.5)
    assert got[("a", "a")] == (1, 0.25)
    assert got[("a", "c")] == (1, 0.25)
    # from b: ->a twice (2 total)
    assert got[("b", "a")] == (2, 1.0)
    assert len(got) == 4


def test_rollup_merge_equals_recompute(spark):
    from dane_visual_feature_extraction_worker_spark.operators.rollup import (
        merge_rollups,
        rollup_state,
    )

    rng = np.random.default_rng(13)
    rows = [
        (f"k{int(k)}", float(v))
        for k, v in zip(
            rng.integers(0, 7, 3000), rng.uniform(-100, 100, 3000).round(2)
        )
    ]
    df = spark.createDataFrame(rows, "key string, value double")
    # 3-way split, including an empty slice and keys absent from slices
    a = df.where(F.col("value") < -30)
    b = df.where((F.col("value") >= -30) & (F.col("value") < 55))
    c = df.where(F.col("value") >= 55)
    merged = merge_rollups(
        rollup_state(a, "key"), rollup_state(b, "key"), rollup_state(c, "key")
    )
    full = rollup_state(df, "key")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_rollup_merge_disjoint_keys_pass_through(spark):
    from dane_visual_feature_extraction_worker_spark.operators.rollup import (
        merge_rollups,
        rollup_state,
    )

    a = rollup_state(
        spark.createDataFrame([("x", 1.0)], "key string, value double"), "key"
    )
    b = rollup_state(
        spark.createDataFrame([("y", 2.0)], "key string, value double"), "key"
    )
    got = {r["key"]: r["n_rows"] for r in merge_rollups(a, b).collect()}
    assert got == {"x": 1, "y": 1}
