"""Round-5 operators: per-entity quota caps, CDC merge, corpus-LM
quality. Each asserts the scale-relevant contract, not just values:
quota keeps exactly min(cap, n) per entity and is layout-stable; merge
is latest-version-wins with disjoint inserts preserved; the LM score is
pure int64 downstream of the per-term quantization."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from dane_visual_feature_extraction_worker_spark.operators.merge import merge_upsert
from dane_visual_feature_extraction_worker_spark.operators.quota import (
    quota_sample,
    validate_quota,
)
from dane_visual_feature_extraction_worker_spark.operators.textstats import (
    unigram_logprob_score,
)


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # entity 'hot' holds 1000 rows, ten cold entities hold 20 each
    return spark.range(1200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, F.lit("hot"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 10).cast("string")))
        .alias("ent"),
    )


def test_quota_exact_counts_and_stability(spark, skewed_docs):
    out = quota_sample(skewed_docs, "ent", cap=50, id_col="doc_id", salt="t")
    got = {r["ent"]: r["n"] for r in out.groupBy("ent").agg(F.count("*").alias("n")).collect()}
    assert got["hot"] == 50
    for i in range(10):
        assert got[f"c{i}"] == 20  # under-cap entities untouched
    # layout-independent: same kept set after repartition
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in quota_sample(
            skewed_docs.repartition(13), "ent", cap=50, id_col="doc_id", salt="t"
        ).collect()
    }
    assert a == b
    assert validate_quota(skewed_docs, out, "ent", 50).count() == 0


def test_quota_prefilter_margin_guard(spark, skewed_docs):
    with pytest.raises(ValueError):
        quota_sample(skewed_docs, "ent", cap=50, prefilter_margin=1.0)
    with pytest.raises(ValueError):
        quota_sample(skewed_docs, "ent", cap=0)


def test_quota_matches_plain_window(spark, skewed_docs):
    """The routed + prefiltered plan must equal the naive global
    row_number formulation row for row."""
    from pyspark.sql import Window

    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        sample_key,
    )

    w = Window.partitionBy("ent").orderBy(
        sample_key(F.col("doc_id"), "t").asc(), F.col("doc_id").asc()
    )
    naive = (
        skewed_docs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 50)
        .drop("rk")
    )
    routed = quota_sample(skewed_docs, "ent", cap=50, id_col="doc_id", salt="t")
    assert {r["doc_id"] for r in naive.collect()} == {
        r["doc_id"] for r in routed.collect()
    }


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k int, v string, rev int"
    )
    ups = spark.createDataFrame(
        [(2, "B", 20), (4, "d", 20)], "k int, v string, rev int"
    )
    out = {r["k"]: (r["v"], r["rev"]) for r in merge_upsert(base, ups, "k", "rev").collect()}
    assert out == {1: ("a", 10), 2: ("B", 20), 3: ("c", 10), 4: ("d", 20)}


def test_merge_upsert_schema_mismatch(spark):
    base = spark.createDataFrame([(1, "a")], "k int, v string")
    ups = spark.createDataFrame([(1, 2)], "k int, w int")
    with pytest.raises(ValueError):
        merge_upsert(base, ups, "k", "v")


def test_unigram_score_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "   ")], "doc_id int, text string"
    )
    # corpus: a=2 b=2 c=1, N=5; vocab_k=2 keeps a,b (count desc, term asc)
    out = {r["doc_id"]: r.asDict() for r in unigram_logprob_score(docs, vocab_k=2).collect()}
    assert 3 not in out  # no tokens -> excluded
    lp_a = math.floor(math.log(5 / 2) * 1e6)
    lp_oov = math.floor(math.log(10) * 1e6)
    assert out[1]["nll_micro_sum"] == 2 * lp_a + lp_a  # a a b -> 2*lp(a)+lp(b)
    assert out[1]["oov_toks"] == 0
    assert out[2]["nll_micro_sum"] == lp_a + lp_oov  # b + OOV c
    assert out[2]["oov_toks"] == 1
    assert out[2]["nll_mean"] == ((lp_a + lp_oov) // 2) / 1e6
