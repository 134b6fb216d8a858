"""BPE-style merge training: greedy fold vs a pure-Python reference,
corner cases (overlapping runs), round determinism."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F


def _py_merge(xs, a, b):
    out, i = [], 0
    while i < len(xs):
        if i + 1 < len(xs) and xs[i] == a and xs[i + 1] == b:
            out.append(a + "_" + b)
            i += 2
        else:
            out.append(xs[i])
            i += 1
    return out


def _py_rounds(docs, rounds):
    docs = {k: list(v) for k, v in docs.items()}
    merges = []
    for _ in range(rounds):
        counts = {}
        for xs in docs.values():
            for a, b in zip(xs, xs[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, n))
        docs = {k: _py_merge(v, a, b) for k, v in docs.items()}
    return docs, merges


def test_merge_pair_corners(spark):
    cases = [
        (["a", "b", "a", "b", "a"], "a", "b"),
        (["a", "a", "a", "a"], "a", "a"),   # overlapping run: 2 merges
        (["a", "a", "a"], "a", "a"),        # odd run: 1 merge + leftover
        ([], "a", "b"),
        (["x"], "a", "b"),
        (["a", "b"], "a", "b"),
        (["b", "a", "b", "b", "a", "b"], "a", "b"),
    ]
    from dane_visual_feature_extraction_worker_spark.operators.bpe import (
        merge_pair,
    )

    df = spark.createDataFrame(
        [(i, xs) for i, (xs, _, _) in enumerate(cases)],
        "i long, toks array<string>",
    )
    for i, (xs, a, b) in enumerate(cases):
        got = (
            df.where(F.col("i") == i)
            .select(merge_pair(F.col("toks"), a, b).alias("m"))
            .collect()[0]["m"]
        )
        assert got == _py_merge(xs, a, b), (i, got)


def test_bpe_rounds_match_python_reference(spark):
    from dane_visual_feature_extraction_worker_spark.operators.bpe import (
        bpe_merge_rounds,
    )

    rng = np.random.default_rng(17)
    vocab = ["the", "cat", "sat", "on", "mat", "ran"]
    docs = {
        i: [vocab[j] for j in rng.integers(0, len(vocab), rng.integers(4, 40))]
        for i in range(30)
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, toks array<string>"
    )
    merged, merges = bpe_merge_rounds(df, rounds=3)
    want_docs, want_merges = _py_rounds(docs, 3)
    assert merges == want_merges
    got = {r["doc_id"]: r["toks"] for r in merged.collect()}
    assert got == want_docs


def test_bpe_deterministic_under_repartition(spark):
    from dane_visual_feature_extraction_worker_spark.operators.bpe import (
        bpe_merge_rounds,
    )

    rows = [(i, ["a", "b", "c", "a", "b"] * (1 + i % 3)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    _, m1 = bpe_merge_rounds(df, rounds=2)
    _, m2 = bpe_merge_rounds(df.repartition(7), rounds=2)
    assert m1 == m2


def test_bpe_raises_on_exhausted_corpus(spark):
    import pytest

    from dane_visual_feature_extraction_worker_spark.operators.bpe import (
        bpe_merge_rounds,
    )

    df = spark.createDataFrame(
        [(0, ["u", "v"])], "doc_id long, toks array<string>"
    )
    with pytest.raises(ValueError, match="exhausted"):
        bpe_merge_rounds(df, rounds=2)
