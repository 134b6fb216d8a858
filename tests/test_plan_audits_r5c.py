"""Plan audits for the retrieval/LM/sketch batches — the shapes the
SURVEY rows claim, pinned so a refactor can't silently regress them."""

from __future__ import annotations

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=400):
    # doc_id must NOT be a pure alias of the Range id: Range reports a
    # range output partitioning that would satisfy the window/groupBy
    # distribution for free and hide the one real exchange these
    # audits count.
    return spark.range(n).select(
        ((F.col("id") * 37) % 1009).alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("scan"),
            F.lit("merge"),
            (F.col("id") % 97).cast("string"),
            (F.col("id") % 31).cast("string"),
            F.lit("vector"),
        ).alias("text"),
    )


def _toks(spark, n=400):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        _tokens,
    )

    return _docs(spark, n).select("doc_id", _tokens("text").alias("toks"))


def test_bm25_prunes_before_exchange_and_takeordered(spark):
    """The postings branch filters to the query-term set (visible as an
    IN predicate below the aggregation) and the final top-k is a k-row
    TakeOrdered, never a global Sort."""
    from dane_visual_feature_extraction_worker_spark.operators.retrieval import (
        bm25_topk,
    )

    p = _plan(bm25_topk(_toks(spark), F.col("toks"), ["scan", "merge"], k=5))
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p
    assert " IN (scan,merge)" in p, p


def test_edit1_never_theta_joins(spark):
    """The deletion-neighborhood join is an EQUI-join on the variant:
    no cartesian product, no nested-loop join anywhere."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        edit1_pairs,
    )

    p = _plan(edit1_pairs(_docs(spark), F.col("text"), key_len=8))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_transition_matrix_no_join_bounded_exchanges(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        transition_matrix,
    )

    e = spark.range(3000).select(
        (F.col("id") % 40).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") % 5).cast("string").alias("event_type"),
        F.col("id").cast("timestamp").alias("ts"),
    )
    p = _plan(transition_matrix(e))
    assert "Join" not in p, p
    # lag window (entity) + pair count + src-normalize window
    assert p.count("Exchange hashpartitioning") == 3, p


def test_span_corrupt_single_corpus_exchange(spark):
    """Sentinel numbering (window on doc_id) and reassembly (groupBy
    doc_id) share ONE exchange — the claim in the SURVEY row."""
    from dane_visual_feature_extraction_worker_spark.operators.packing import (
        span_corrupt,
    )

    p = _plan(span_corrupt(_docs(spark)))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Join" not in p, p


def test_kmv_two_exchanges_no_join(spark):
    """Distinct (group, hash) pairs, then the group-partitioned
    k-smallest window; the final rollup reuses the window's
    partitioning."""
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        kmv_distinct,
    )

    e = spark.range(5000).select(
        (F.col("id") % 5).cast("string").alias("event_type"),
        (F.col("id") % 700).cast("string").alias("user_id"),
    )
    p = _plan(kmv_distinct(e))
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 2, p


def test_cms_probe_prune_and_broadcast_sketch(spark):
    """Exact counts prune the token stream to the probe set before
    their shuffle; the 4096-cell sketch reaches the probe join as a
    broadcast."""
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        cms_estimates,
    )

    toks = _toks(spark).select(F.explode("toks").alias("term"))
    p = _plan(cms_estimates(toks, ["scan", "merge"]))
    assert " IN (scan,merge)" in p, p
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p


def test_lm_scores_no_cartesian_vocab_broadcast(spark):
    """The corpus joins the model table once on (w1, w2); V rides a
    broadcast, never a driver collect — no cartesian product in the
    plan (the scalar cross join is a broadcast nested loop over ONE
    row, which Spark prints as BroadcastNestedLoopJoin)."""
    from dane_visual_feature_extraction_worker_spark.operators.lm import (
        bigram_lm_scores,
    )

    p = _plan(bigram_lm_scores(_toks(spark), F.col("toks")))
    assert "CartesianProduct" not in p, p
    assert "BroadcastExchange" in p, p
