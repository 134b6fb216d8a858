"""Plan audits for the hybrid/eval/screening batches (r5 fourth wave) —
the shapes the SURVEY rows claim, pinned so a refactor can't silently
regress them."""

from __future__ import annotations

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _events(spark, n=2000):
    return spark.range(n).select(
        ((F.col("id") * 37) % 211).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("error")),
            ((F.col("id") % 3) + 1).cast("int"),
        ).alias("event_type"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        ((F.col("id") % 997).cast("double") / 7.0).alias("value"),
    )


def test_hashed_bow_partial_agg_before_exchange(spark):
    """One hash exchange on (doc, bucket); the token stream combines
    map-side first (partial HashAggregate below the exchange)."""
    from dane_visual_feature_extraction_worker_spark.operators.encoding import (
        hashed_bow,
    )

    docs = spark.range(300).select(
        ((F.col("id") * 13) % 101).alias("doc_id"),
        F.array(
            (F.col("id") % 29).cast("string"),
            (F.col("id") % 7).cast("string"),
            F.lit("tok"),
        ).alias("toks"),
    )
    p = _plan(hashed_bow(docs, F.col("toks"), n_buckets=64))
    assert p.count("Exchange hashpartitioning") == 1, p
    # partial agg below the exchange: two HashAggregates total
    assert p.count("HashAggregate") == 2, p


def test_ks_drift_one_corpus_exchange_no_corpus_sort(spark):
    """The corpus shuffles ONCE (the distinct-cent count); the running
    CDF window sorts only the domain-bounded cent frame."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        ks_drift,
    )

    p = _plan(ks_drift(_events(spark)))
    # cent-count exchange + two single-partition collapses for the
    # window/rollup (domain-sized frames), never a second corpus hash
    assert p.count("Exchange hashpartitioning") <= 1, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastExchange" in p, p  # the lazy time-cut scalar


def test_auc_exact_histogram_not_corpus_sort(spark):
    """AUC comes from the score histogram: one corpus exchange for the
    distinct-score counts; the only Sort is over that domain-bounded
    frame (inside a single-partition window), never the corpus."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        auc_exact,
    )

    p = _plan(
        auc_exact(
            _events(spark),
            (F.col("value") * 100).cast("bigint"),
            F.when(F.col("event_type") == "error", 1).otherwise(0),
        )
    )
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "CartesianProduct" not in p, p


def test_chi2_and_mi_share_single_entity_exchange(spark):
    """Both screens ride ONE corpus exchange on the entity key (the
    _contingency_2x2 core); the category rollup exchanges only
    |categories| rows."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        chi2_select,
        mutual_info_select,
    )

    import re

    for op in (chi2_select, mutual_info_select):
        p = _plan(op(_events(spark)))
        # both the report branch and the totals scalar read the CACHED
        # rollup (the sentinel trick): the hash exchanges under the
        # InMemoryRelation print once per read but EXECUTE once —
        # count distinct plan ids, not occurrences
        assert p.count("InMemoryRelation") == 2, (op.__name__, p)
        ids = set(
            m.group(1)
            for m in re.finditer(
                r"Exchange hashpartitioning.*?plan_id=(\d+)", p
            )
        )
        assert len(ids) == 2, (op.__name__, sorted(ids), p)
        assert "CartesianProduct" not in p, p
        assert "BroadcastExchange" in p, p  # the population scalar


def test_rrf_fuse_windows_over_candidate_frames_only(spark):
    """Fusion never touches a corpus: inputs are k-row frames and the
    fused top-k is a TakeOrdered, not a global sort of anything big."""
    from dane_visual_feature_extraction_worker_spark.operators.retrieval import (
        rrf_fuse,
    )

    a = spark.createDataFrame([(1, 0.9), (2, 0.5)], "id long, s double")
    b = spark.createDataFrame([(2, 3.0), (3, 1.0)], "id long, s double")
    p = _plan(rrf_fuse([(a, "s", "id"), (b, "s", "id")], k=5))
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p


def test_ndcg_ideal_is_takeordered(spark):
    """The ideal ranking is a k-row TakeOrdered over the corpus — a
    global Sort of the relevance frame would be the 10^12-row bug."""
    from dane_visual_feature_extraction_worker_spark.operators.retrieval import (
        ndcg_at_k,
    )

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.array(F.lit("scan"), (F.col("id") % 11).cast("string")).alias(
            "toks"
        ),
    )
    ranked = spark.createDataFrame(
        [(1, 3.0), (2, 2.0)], "doc_id long, bm25 double"
    )
    p = _plan(
        ndcg_at_k(docs, F.col("toks"), ["scan", "merge"], ranked, k=5)
    )
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p
