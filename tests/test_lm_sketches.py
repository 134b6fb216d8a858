"""Bigram LM scoring, T5 span corruption, deterministic KMV / CMS
sketches — the round-5 LM-quality + sketch batch."""

from __future__ import annotations

import math
import re

import numpy as np
import pyspark.sql.functions as F


def _lm_ref(docs: dict[int, list[str]]) -> dict[int, tuple[int, float]]:
    """Driver-side add-one bigram LM replaying the micro-nat math."""
    c12: dict[tuple[str, str], int] = {}
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), c in c12.items():
        c1[a] = c1.get(a, 0) + c
    v = len(c1)
    out = {}
    for d, toks in docs.items():
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            continue
        micro = sum(
            math.floor(math.log(c1[a] + v) * 1e6)
            - math.floor(math.log(c12[(a, b)] + 1) * 1e6)
            for a, b in bgs
        )
        out[d] = (len(bgs), math.floor(micro / len(bgs)) / 1e6)
    return out


def _toy_corpus(n=50, seed=7):
    rng = np.random.default_rng(seed)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far"]
    return {
        i: [vocab[j] for j in rng.integers(0, len(vocab), rng.integers(2, 25))]
        for i in range(n)
    }


def test_bigram_lm_matches_reference(spark):
    from dane_visual_feature_extraction_worker_spark.operators.lm import (
        bigram_lm_scores,
    )

    docs = _toy_corpus()
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, toks array<string>"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in bigram_lm_scores(df, F.col("toks")).collect()
    }
    assert got == _lm_ref(docs)


def test_bigram_lm_flags_gibberish(spark):
    """A doc repeating the corpus's most common bigram scores LOWER
    avg_nll than a doc of never-repeated token pairs — the filter
    semantics the perplexity gate relies on."""
    from dane_visual_feature_extraction_worker_spark.operators.lm import (
        bigram_lm_scores,
    )

    rows = [(i, ["the", "cat"] * 10) for i in range(20)]
    rows.append((100, [f"zx{j}" for j in range(20)]))
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    nll = {
        r["doc_id"]: r["avg_nll"]
        for r in bigram_lm_scores(df, F.col("toks")).collect()
    }
    assert nll[0] < nll[100]


def test_bigram_lm_drops_short_docs(spark):
    from dane_visual_feature_extraction_worker_spark.operators.lm import (
        bigram_lm_scores,
    )

    df = spark.createDataFrame(
        [(0, ["solo"]), (1, []), (2, ["a", "b"])],
        "doc_id long, toks array<string>",
    )
    got = bigram_lm_scores(df, F.col("toks")).collect()
    assert [r["doc_id"] for r in got] == [2]


_SENT = re.compile(r"^<extra_id_(\d+)>$")


def _reconstruct(input_text: str, target_text: str) -> list[str]:
    """Splice target spans back into the input at their sentinels."""
    spans: dict[int, list[str]] = {}
    cur = None
    for tok in target_text.split(" "):
        m = _SENT.match(tok)
        if m:
            cur = int(m.group(1))
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out: list[str] = []
    for tok in input_text.split(" "):
        m = _SENT.match(tok)
        out.extend(spans[int(m.group(1))] if m else [tok])
    return out


def test_span_corrupt_roundtrip(spark):
    """input + target reassemble to the original token stream for every
    document; sentinel count equals n_spans; output is deterministic
    under repartitioning."""
    from dane_visual_feature_extraction_worker_spark.operators.packing import (
        span_corrupt,
    )

    docs = _toy_corpus(n=40, seed=11)
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in span_corrupt(df).collect()}
    assert set(out) == set(docs)
    masked_any = 0
    for d, toks in docs.items():
        r = out[d]
        assert _reconstruct(r["input_text"], r["target_text"]) == toks
        n_sent_in = sum(1 for t in r["input_text"].split(" ") if _SENT.match(t))
        assert n_sent_in == r["n_spans"]
        assert r["target_text"].endswith(f"<extra_id_{r['n_spans']}>")
        masked_any += r["n_spans"]
    assert masked_any > 0  # rate 0.15 over 40 docs must mask something
    again = {
        r["doc_id"]: (r["input_text"], r["target_text"])
        for r in span_corrupt(df.repartition(7)).collect()
    }
    assert again == {
        d: (r["input_text"], r["target_text"]) for d, r in out.items()
    }


def test_span_corrupt_unmasked_doc_shape(spark):
    """mask_rate=0 -> input == original text, target == closing
    sentinel only, n_spans == 0."""
    from dane_visual_feature_extraction_worker_spark.operators.packing import (
        span_corrupt,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    r = span_corrupt(df, mask_rate=0.0).collect()[0]
    assert r["input_text"] == "alpha beta gamma delta"
    assert r["target_text"] == "<extra_id_0>"
    assert r["n_spans"] == 0


def test_kmv_exact_below_k(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        kmv_distinct,
    )

    rows = [("a", f"u{i % 7}") for i in range(100)] + [
        ("b", f"v{i % 40}") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id string")
    got = {
        r["event_type"]: (r["n_kept"], r["kmv_estimate"])
        for r in kmv_distinct(df, k=64).collect()
    }
    assert got == {"a": (7, 7), "b": (40, 40)}


def test_kmv_estimate_accuracy(spark):
    """5000 distinct values, k=64: the KMV estimator's relative error
    is deterministic given the md5 key — assert it lands within 3/sqrt(k)
    (~38%), far looser than the expected 1/sqrt(k) so the test is
    stable, and tight enough to catch a broken estimator."""
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        kmv_distinct,
    )

    df = spark.createDataFrame(
        [("a", f"user{i}") for i in range(5000)],
        "event_type string, user_id string",
    )
    r = kmv_distinct(df, k=64).collect()[0]
    assert r["n_kept"] == 64
    assert abs(r["kmv_estimate"] - 5000) / 5000 < 3 / math.sqrt(64)


def test_cms_overestimates_and_bounds(spark):
    """CMS estimate >= exact for every probe, and the min-over-rows
    error stays under 3N/w on this fixed input (deterministic)."""
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        cms_estimates,
    )

    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(300)] + ["hot"] * 40
    stream = [vocab[j] for j in rng.integers(0, len(vocab), 20000)]
    df = spark.createDataFrame([(t,) for t in stream], "term string")
    probes = ["hot", "t0", "t1", "missing"]
    got = {
        r["term"]: (r["exact_count"], r["cms_estimate"])
        for r in cms_estimates(df, probes, depth=4, width=1024).collect()
    }
    assert set(got) == set(probes)
    assert got["missing"][0] == 0
    n = len(stream)
    for term, (exact, est) in got.items():
        assert est >= exact
        assert est - exact <= 3 * n / 1024
    exact_hot = sum(1 for t in stream if t == "hot")
    assert got["hot"][0] == exact_hot
