"""Burst detection + packing-efficiency report."""

from __future__ import annotations

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_burst_windows_semantics(spark):
    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        burst_windows,
    )

    rows = []
    eid = 0
    # user 1: steady 2 events/hour for hours 0..23, then 30 in hour 24
    for h in range(24):
        for _ in range(2):
            rows.append((eid, 1, h * 3600 + 10)); eid += 1
    for _ in range(30):
        rows.append((eid, 1, 24 * 3600 + 10)); eid += 1
    # user 2: one isolated event (cold start -> never a burst)
    rows.append((eid, 2, 50 * 3600)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, epoch long"
    ).select(
        "event_id", "user_id", F.timestamp_seconds("epoch").alias("ts")
    )
    out = {
        (r["user_id"], r["win"]): r
        for r in burst_windows(ev, trailing=24, factor=3).collect()
    }
    # hour 24 for user 1: cnt=30, trailing_sum=48 -> 30*24 > 3*48
    r = out[(1, 24)]
    assert (r["cnt"], r["trailing_sum"], r["is_burst"]) == (30, 48, True)
    # steady hour: cnt=2, trailing grows to 2*h -> never a burst after h>=1
    assert out[(1, 10)]["is_burst"] is False
    # hour 0 (cold start trailing=0) and user 2: not bursts
    assert out[(1, 0)]["is_burst"] is False
    assert out[(2, 50)]["is_burst"] is False


def test_burst_windows_single_corpus_exchange(spark):
    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        burst_windows,
    )

    ev = spark.range(500).select(
        ((F.col("id") * 7) % 31).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 97).alias("ts"),
    )
    p = _plan(burst_windows(ev))
    # the count's exchange on (entity, win) also satisfies the window's
    # partitioning on entity? No — window partitions on entity alone, so
    # ONE re-exchange of the histogram is expected; the corpus shuffles
    # once into the count
    assert p.count("Exchange hashpartitioning") <= 2, p
    assert "CartesianProduct" not in p, p


def test_packing_stats_matches_manual(spark):
    import hashlib

    from dane_visual_feature_extraction_worker_spark.operators.packing import (
        packing_stats,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (i + 1))) for i in range(20)],
        "doc_id long, text string",
    )
    out = {r["shard"]: r for r in packing_stats(
        docs, max_tokens=8, n_shards=4
    ).collect()}

    manual: dict[int, list[int]] = {}
    for i in range(20):
        hx = hashlib.md5(f"pack|{i}".encode()).hexdigest()
        manual.setdefault(int(hx[:8], 16) % 4, []).append(i + 1)
    for shard, toks in manual.items():
        r = out[shard]
        total = sum(toks)
        nseq = (total + 7) // 8
        assert (r["n_docs"], r["n_tokens"], r["n_seqs"]) == (
            len(toks), total, nseq,
        )
        assert r["fill"] == (total * 10**6) // (nseq * 8) / 1e6


def test_packing_stats_empty_shard_null_fill(spark):
    from dane_visual_feature_extraction_worker_spark.operators.packing import (
        packing_stats,
    )

    docs = spark.createDataFrame([(0, "")], "doc_id long, text string")
    r = packing_stats(docs, max_tokens=8, n_shards=1).collect()[0]
    assert (r["n_tokens"], r["n_seqs"], r["fill"]) == (0, 0, None)


def test_jsonl_roundtrip_null_and_escaping(spark, tmp_path):
    """to_json drops nulls and escapes newlines/quotes; the declared-
    schema reader must restore them losslessly."""
    docs = spark.createDataFrame(
        [
            (0, 'line1\nline2 "quoted" \t tab', "en"),
            (1, None, "de"),
            (2, "unicode é中文", None),
        ],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "jl")
    docs.select(
        F.to_json(F.struct("doc_id", "text", "lang")).alias("value")
    ).write.mode("overwrite").text(out)
    back = spark.read.schema("doc_id bigint, text string, lang string").json(
        out
    )
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()}
    assert got == {
        0: ('line1\nline2 "quoted" \t tab', "en"),
        1: (None, "de"),
        2: ("unicode é中文", None),
    }


def test_class_weights_formula(spark, monkeypatch):
    import dane_visual_feature_extraction_worker_spark.plans.driver_queries as dq

    emb = spark.createDataFrame(
        [(i, 0 if i < 6 else (1 if i < 8 else 2)) for i in range(12)],
        "vec_id long, label int",
    )
    monkeypatch.setattr(dq, "_embeddings", lambda s, d: emb)
    out = {r["label"]: r for r in dq.QUERIES["class_weights"](
        spark, "unused"
    ).collect()}
    # N=12, K=3: weights 12e6//(3*n) / 1e6
    assert out[0]["n"] == 6 and out[0]["weight"] == (12 * 10**6) // 18 / 1e6
    assert out[1]["n"] == 2 and out[1]["weight"] == (12 * 10**6) // 6 / 1e6
    assert out[2]["n"] == 4 and out[2]["weight"] == (12 * 10**6) // 12 / 1e6


def test_bloom_export_bits_and_probe(spark):
    import hashlib

    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        bloom_export,
    )

    keys = ["alpha", "beta", "gamma"]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    out = {r["word"]: r["bits"] for r in bloom_export(
        df, F.col("k"), m_bits=256, k=3
    ).collect()}

    words = {}
    for kk in keys:
        hx = hashlib.md5(kk.encode()).hexdigest()
        for j in range(3):
            p = int(hx[8 * j: 8 * j + 8], 16) % 256
            words[p // 32] = words.get(p // 32, 0) | (1 << (p % 32))
    assert out == words
    # probe: every inserted key finds all its bits set
    for kk in keys:
        hx = hashlib.md5(kk.encode()).hexdigest()
        for j in range(3):
            p = int(hx[8 * j: 8 * j + 8], 16) % 256
            assert out[p // 32] & (1 << (p % 32))


def test_bloom_export_validations(spark):
    import pytest

    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        bloom_export,
    )

    df = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(ValueError):
        bloom_export(df, F.col("k"), m_bits=100)
    with pytest.raises(ValueError):
        bloom_export(df, F.col("k"), k=4)


def test_lifetime_features_exact(spark):
    from dane_visual_feature_extraction_worker_spark.operators.funnel import (
        lifetime_features,
    )

    day = 86400
    rows = [
        (1, 10), (1, 10 + day), (1, 10 + day + 100), (1, 10 + 3 * day),
        (2, 500),
    ]
    ev = spark.createDataFrame(rows, "user_id long, epoch long").select(
        "user_id", F.timestamp_seconds("epoch").alias("ts")
    )
    out = {r["user_id"]: r for r in lifetime_features(ev).collect()}
    u1 = out[1]
    assert u1["tenure_days"] == 3
    assert u1["active_days"] == 3  # days 0, 1, 3
    assert u1["n_events"] == 4
    u2 = out[2]
    assert (u2["tenure_days"], u2["active_days"], u2["n_events"]) == (0, 1, 1)


def test_ngram_novelty_shared_vs_unique(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        ngram_novelty,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c d"),        # shingles: "a b c", "b c d"
            (1, "a b c x y"),      # shares "a b c"; unique "b c x", "c x y"
            (2, "zz"),             # < 3 tokens -> absent
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert set(out) == {0, 1}
    assert (out[0]["n_shingles"], out[0]["novel"]) == (2, 1)
    assert out[0]["novelty"] == (1 * 10**6) // 2 / 1e6
    assert (out[1]["n_shingles"], out[1]["novel"]) == (3, 2)


def test_precision_recall_at_k_exact(spark):
    from dane_visual_feature_extraction_worker_spark.operators.retrieval import (
        precision_recall_at_k,
    )

    docs = spark.createDataFrame(
        [
            (0, ["scan", "x"]), (1, ["merge"]), (2, ["y"]),
            (3, ["vector", "z"]), (4, ["w"]),
        ],
        "doc_id long, toks array<string>",
    )
    # retrieved: 0 (rel), 2 (not), 3 (rel) at k=3
    ranked = spark.createDataFrame(
        [(0, 3.0), (2, 2.0), (3, 1.0)], "doc_id long, bm25 double"
    )
    row = precision_recall_at_k(
        docs, F.col("toks"), ["scan", "merge", "vector"], ranked, k=3
    ).collect()[0]
    assert (row["n_retrieved"], row["n_relevant"], row["hits"]) == (3, 3, 2)
    assert row["p_at_k"] == (2 * 10**6) // 3 / 1e6
    assert row["r_at_k"] == (2 * 10**6) // 3 / 1e6
