"""Retrieval-MRR + compression-ratio batch."""

from __future__ import annotations

import zlib

import pyspark.sql.functions as F
import pytest


def test_mrr_first_relevant_rank(spark):
    from dane_visual_feature_extraction_worker_spark.operators.retrieval import mrr_at_k
    from dane_visual_feature_extraction_worker_spark.operators.textstats import _tokens

    # doc 1 matches only 'cat' (partial), doc 2 matches both terms but
    # shorter tf; doc 3 matches both terms heavily -> ranks first and
    # is relevant.
    rows = [
        (1, "cat cat cat cat"),
        (2, "cat dog"),
        (3, "cat dog cat dog cat dog"),
        (4, "bird"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", _tokens("text").alias("__t")
    )
    out = {
        r["qid"]: r
        for r in mrr_at_k(
            d, F.col("__t"), {"q": ["cat", "dog"]}, k=10
        ).collect()
    }
    q = out["q"]
    # relevance = contains BOTH terms: docs 2 and 3. BM25 ranks doc 3
    # or 1 first depending on tf/idf; rr = 1/rank of first of {2,3}.
    assert q["first_rel_rank"] is not None
    assert q["rr_micro"] == 1_000_000 // q["first_rel_rank"]
    assert out["__mrr__"]["rr_micro"] == q["rr_micro"]  # single query


def test_mrr_no_relevant_and_validation(spark):
    from dane_visual_feature_extraction_worker_spark.operators.retrieval import mrr_at_k
    from dane_visual_feature_extraction_worker_spark.operators.textstats import _tokens

    d = spark.createDataFrame(
        [(1, "cat"), (2, "dog")], "doc_id long, text string"
    ).select("doc_id", _tokens("text").alias("__t"))
    out = {
        r["qid"]: r
        for r in mrr_at_k(
            d,
            F.col("__t"),
            {"qa": ["cat", "dog"], "qb": ["zzz"]},
            k=10,
        ).collect()
    }
    # qa: no single doc contains both -> rr 0; qb: no candidates -> 0
    assert out["qa"]["rr_micro"] == 0 and out["qa"]["first_rel_rank"] is None
    assert out["qb"]["rr_micro"] == 0
    assert out["__mrr__"]["rr_micro"] == 0
    with pytest.raises(ValueError):
        mrr_at_k(d, F.col("__t"), {}, k=10)
    with pytest.raises(ValueError):
        mrr_at_k(d, F.col("__t"), {"q": []}, k=10)


def test_compression_ratio_matches_direct_zlib(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        compression_ratio,
    )

    rows = [
        (1, "abc " * 200, "rep"),          # highly repetitive
        (2, "the quick brown fox jumps over the lazy dog", "nat"),
        (3, None, "nat"),                   # null text -> 0 bytes
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["grp"]: r for r in compression_ratio(df).collect()}

    def z(s):
        b = (s or "").encode("utf-8")
        return len(b), len(zlib.compress(b, 6))

    raw_rep, comp_rep = z(rows[0][1])
    assert (got["rep"]["raw_bytes"], got["rep"]["comp_bytes"]) == (
        raw_rep,
        comp_rep,
    )
    assert got["rep"]["ratio_micro"] == comp_rep * 1_000_000 // raw_rep
    # repetitive text compresses much harder than natural text
    assert got["rep"]["ratio_micro"] < got["nat"]["ratio_micro"]
    raw_nat = z(rows[1][1])[0]
    comp_nat = z(rows[1][1])[1]
    assert got["nat"]["raw_bytes"] == raw_nat  # null adds 0
    assert got["nat"]["comp_bytes"] == comp_nat + z("")[1]
    with pytest.raises(ValueError):
        compression_ratio(df, level=11)
