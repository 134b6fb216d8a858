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
