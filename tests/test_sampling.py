"""Deterministic sampling / split operators: reproducibility is the
whole point — same ids in, same sample out, on any layout."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dane_visual_feature_extraction_worker_spark.operators.sampling import (
    SAMPLE_SPACE,
    dataset_split,
    sample_deterministic,
    sample_key,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(10_000).select(F.col("id").alias("doc_id"))


def test_sample_rate_and_determinism(spark, ids):
    s1 = sample_deterministic(ids, 0.25, salt="a")
    n = s1.count()
    assert abs(n / 10_000 - 0.25) < 0.02  # binomial tolerance
    # identical selection on rerun and after repartitioning
    a = {r["doc_id"] for r in s1.collect()}
    b = {
        r["doc_id"]
        for r in sample_deterministic(
            ids.repartition(17), 0.25, salt="a"
        ).collect()
    }
    assert a == b
    # different salt -> a different (independent) draw
    c = {r["doc_id"] for r in sample_deterministic(ids, 0.25, salt="b").collect()}
    assert a != c
    overlap = len(a & c) / len(a)
    assert abs(overlap - 0.25) < 0.05  # independent draws intersect at ~rate


def test_sample_key_uniform_and_bounded(spark, ids):
    stats = ids.select(sample_key(F.col("doc_id")).alias("k")).agg(
        F.min("k"), F.max("k"), F.avg("k")
    ).collect()[0]
    assert 0 <= stats[0] and stats[1] < SAMPLE_SPACE
    assert abs(stats[2] / SAMPLE_SPACE - 0.5) < 0.02


def test_split_exhaustive_disjoint_stable(spark, ids):
    out = dataset_split(ids, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 10_000  # exhaustive, disjoint
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02
    assert abs(counts["val"] / 10_000 - 0.1) < 0.01
    # membership is a pure function of the id
    again = dataset_split(ids.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1})
    a = dict(out.collect())
    for r in again.collect():
        assert a[r["doc_id"]] == r["split"]


def test_split_weights_validated():
    # validation happens before any Spark work (df untouched)
    with pytest.raises(ValueError):
        dataset_split(None, {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError):
        sample_deterministic(None, 1.5)


def test_stratified_rates(spark):
    df = spark.range(9_000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("zh")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    out = stratified_sample(
        df, rates={"en": 0.5, "de": 0.1}, default_rate=1.0
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts["en"] / 3000 - 0.5) < 0.05
    assert abs(counts["de"] / 3000 - 0.1) < 0.03
    assert counts["zh"] == 3000  # default keeps the stratum whole


def test_split_partitions_entire_set_for_any_weights(spark):
    """Property: for random weight vectors summing to 1, dataset_split
    is exhaustive and disjoint (every row exactly one split)."""
    import numpy as np

    ids = spark.range(2_000).select(F.col("id").alias("doc_id"))
    rng = np.random.default_rng(7)
    for _ in range(5):
        w = rng.dirichlet([1.0, 1.0, 1.0, 1.0])
        weights = {f"s{i}": float(x) for i, x in enumerate(w)}
        # normalize float drift so the sum-check passes
        weights["s3"] = 1.0 - sum(list(weights.values())[:3])
        out = dataset_split(ids, weights)
        assert out.count() == 2_000
        assert out.select("doc_id").distinct().count() == 2_000
        got = {r["split"] for r in out.select("split").distinct().collect()}
        assert got <= set(weights)


def test_pack_sequences_matches_python_reference(spark):
    """Concat-and-chunk packing vs a straight python replay: same
    shards (md5 key), same offsets/sequence spans (integer math)."""
    import hashlib

    from dane_visual_feature_extraction_worker_spark.operators.packing import (
        pack_sequences,
        shard_summary,
    )

    rows = [
        (i, " ".join(f"w{j}" for j in range((i * 7) % 23)) if i % 9 else "")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pack_sequences(
        docs, max_tokens=16, n_shards=4, salt="pack"
    ).collect()}

    def key(i):
        return int(hashlib.md5(f"pack|{i}".encode()).hexdigest()[:8], 16)

    # python replay: group by shard, order by doc_id, running offsets
    by_shard: dict = {}
    for i, text in rows:
        by_shard.setdefault(key(i) % 4, []).append(
            (i, len([t for t in text.lower().split() if t]))
        )
    for shard, items in by_shard.items():
        off = 0
        for i, n in sorted(items):
            r = got[i]
            assert r["shard"] == shard
            assert r["n_tokens"] == n
            assert r["tok_offset"] == off
            assert r["seq_first"] == off // 16
            assert r["seq_last"] == (off + max(n, 1) - 1) // 16
            assert r["pack_offset"] == off % 16
            off += n

    summ = {r["shard"]: r for r in shard_summary(
        pack_sequences(docs, max_tokens=16, n_shards=4, salt="pack"),
        max_tokens=16,
    ).collect()}
    for shard, items in by_shard.items():
        tot = sum(n for _, n in items)
        assert summ[shard]["n_docs"] == len(items)
        assert summ[shard]["n_shard_tokens"] == tot
        assert summ[shard]["n_sequences"] == (tot + 15) // 16


def test_temperature_sample_rates_and_budget(spark):
    """alpha=0.5 rates follow q_l ∝ sqrt(n_l) under the budget; rare
    strata are upweighted (rate_rare > rate_common); applying the
    sample keeps ~rate_l per stratum, deterministically."""
    import math

    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        temperature_sample,
        temperature_sample_rates,
    )

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {
        r["lang"]: r for r in temperature_sample_rates(
            docs, alpha=0.5, budget_frac=0.5, stratum_col="lang"
        ).collect()
    }
    s = math.sqrt(900) + math.sqrt(100)
    for lang, n in (("big", 900), ("small", 100)):
        exp = min(1.0, 0.5 * 1000 * math.sqrt(n) / s / n)
        exp = math.floor(exp * 1e6) / 1e6
        assert rates[lang]["rate"] == exp, (lang, rates[lang]["rate"], exp)
    assert rates["small"]["rate"] > rates["big"]["rate"]

    kept = temperature_sample(docs, alpha=0.5, budget_frac=0.5).collect()
    # deterministic: same call, same rows
    kept2 = temperature_sample(docs, alpha=0.5, budget_frac=0.5).collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(
        r["doc_id"] for r in kept2
    )
    n_kept = len(kept)
    assert 0.35 * 1000 < n_kept < 0.65 * 1000  # near budget, hash noise


def test_chunk_documents_coverage_and_overlap(spark):
    """Chunk invariants vs a Python reference: every token index lands
    in >= 1 chunk, consecutive chunks overlap by window - stride, the
    last chunk reaches the final token, and zero-token docs vanish."""
    from dane_visual_feature_extraction_worker_spark.operators.packing import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(150))),  # 3 chunks
            (2, "only four little tokens"),  # 1 short chunk
            (3, " ".join(f"w{i}" for i in range(64))),  # exactly 1 window
            (4, "   "),  # whitespace-only: zero chunks
            (5, " ".join(f"x{i}" for i in range(65))),  # window + 1
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, window=64, stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 4 not in by_doc
    n_toks = {1: 150, 2: 4, 3: 64, 5: 65}
    import math

    for doc, n in n_toks.items():
        chunks = sorted(by_doc[doc], key=lambda r: r["chunk_id"])
        expect = 1 if n <= 64 else 1 + math.ceil((n - 64) / 48)
        assert len(chunks) == expect, (doc, len(chunks), expect)
        covered = set()
        for c in chunks:
            assert c["tok_start"] == c["chunk_id"] * 48
            assert c["n_tokens"] == min(64, n - c["tok_start"])
            covered.update(
                range(c["tok_start"], c["tok_start"] + c["n_tokens"])
            )
        assert covered == set(range(n)), doc


def test_chunk_documents_validates_args(spark):
    from dane_visual_feature_extraction_worker_spark.operators.packing import (
        chunk_documents,
    )

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(docs, window=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=5)


def test_ngram_topk_counts(spark):
    """Bigram and trigram counts vs hand-counted corpus; short docs
    contribute nothing."""
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        ngram_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat"),
            (2, "the cat"),
            (3, "solo"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    bi = {r["gram"]: r["n"] for r in ngram_topk(docs, n=2, k=10).collect()}
    assert bi == {
        "the cat": 3,
        "cat sat": 1,
        "sat on": 1,
        "on the": 1,
    }
    tri = {r["gram"]: r["n"] for r in ngram_topk(docs, n=3, k=10).collect()}
    assert tri == {
        "the cat sat": 1,
        "cat sat on": 1,
        "sat on the": 1,
        "on the cat": 1,
    }


def test_shuffle_assign_is_dense_permutation(spark):
    """(shard, pos) is a dense 1..count_in_shard numbering, the global
    assignment is a permutation of the input ids, deterministic per
    salt, and different salts give different orders."""
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        shuffle_assign,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    out = shuffle_assign(docs, n_shards=4, salt="a").collect()
    assert sorted(r["doc_id"] for r in out) == list(range(500))
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard

    again = shuffle_assign(docs, n_shards=4, salt="a").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = shuffle_assign(docs, n_shards=4, salt="b").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))
