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


def test_winnow_coverage_and_locality(spark):
    """Winnowing guarantees: (1) every w-window of k-gram positions
    contains at least one selected fingerprint; (2) two docs sharing a
    run of >= w+k-1 tokens share at least one fingerprint VALUE."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (1, "one two three " + shared + " four five six"),
        (2, "uno dos tres cuatro " + shared + " cinco"),
        (3, "completely different words everywhere here now okay"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fp = winnow_fingerprints(df, k=3, w=4)
    rows = fp.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["fingerprint"]))
    # coverage: in every window of 4 consecutive k-gram positions there
    # is a selected position
    for d, (_, text) in zip([1, 2, 3], [(None, t) for _, t in docs]):
        n_grams = len(text.split()) - 2
        sel_pos = sorted(p for p, _ in by_doc[d])
        for start in range(0, n_grams - 3):
            assert any(start <= p <= start + 3 for p in sel_pos), (d, start)
    # locality: docs 1 and 2 share the 8-token run -> shared value
    f1 = {v for _, v in by_doc[1]}
    f2 = {v for _, v in by_doc[2]}
    f3 = {v for _, v in by_doc[3]}
    assert f1 & f2
    assert not (f1 & f3)
