"""Plan audits for the round-5 closing batches (moment_profile,
odds_ratio, cliffs_delta, lift_at_k, first_touch/conversion_lag,
activity_grid, new_vs_returning) — the exchange-count and join-shape
claims the docstrings make, pinned so a refactor can't silently
regress them."""

from __future__ import annotations

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _events(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        ((F.col("id") * 37) % 211).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            ((F.col("id") % 3) + 1).cast("int"),
        ).alias("event_type"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        ((F.col("id") % 997).cast("double") / 7.0).alias("value"),
        F.concat(
            F.lit('{"k": '), (F.col("id") % 7).cast("string"), F.lit("}")
        ).alias("props"),
    )


def test_moment_profile_single_exchange_no_join_no_window(spark):
    """One |groups|-key exchange; the value column never shuffles —
    only the five per-partition partials do."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        moment_profile,
    )

    p = _plan(moment_profile(_events(spark), "event_type", "value"))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Join" not in p and "Window" not in p, p
    # partial aggregation (map-side combine) before the exchange
    assert "partial_sum" in p or "HashAggregate" in p, p


def test_odds_ratio_single_exchange_no_join_no_window(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        odds_ratio_report,
    )

    p = _plan(
        odds_ratio_report(
            _events(spark),
            F.col("user_id") % 7,
            F.col("event_type") == "click",
            F.col("value") > 50,
        )
    )
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Join" not in p and "Window" not in p, p


def test_cliffs_delta_histogram_exchange_then_bounded_window(spark):
    """One corpus exchange to the distinct-cent histogram; the rank
    window runs over that domain-bounded frame, never corpus rows."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        cliffs_delta,
    )

    p = _plan(
        cliffs_delta(_events(spark), "event_type", "value", "click", "view")
    )
    # cent-histogram groupBy exchange + the single-partition collapse
    # for the window/rollup; no join anywhere
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Join" not in p, p


def test_lift_at_k_broadcast_ks_join_only(spark):
    """The only join is the broadcast |ks|-row crossing-cell select —
    never a corpus-side shuffle join, never a per-row NTILE sort."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        lift_at_k,
    )

    p = _plan(
        lift_at_k(
            _events(spark),
            (F.col("value") * 100).cast("bigint"),
            (F.col("event_type") == "click").cast("int"),
        )
    )
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p  # histogram only
    assert "ntile" not in p.lower(), p


def test_conversion_lag_entity_exchange_then_cell_windows(spark):
    """One entity (user) exchange for the carry window, one cell
    exchange for the (campaign, lag_s) histogram; quantile windows run
    on the cell frame. No join anywhere."""
    from dane_visual_feature_extraction_worker_spark.plans.driver_queries import (
        QUERIES,
    )
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="plan_lag_")
    _events(spark).write.mode("overwrite").parquet(
        os.path.join(tmp, "events.parquet")
    )
    try:
        p = _plan(QUERIES["conversion_lag"](spark, tmp))
        assert "Join" not in p, p
        # user carry + cell histogram + per-campaign window partitioning
        assert 2 <= p.count("Exchange hashpartitioning") <= 3, p
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_new_vs_returning_three_coarsening_exchanges_no_join(spark):
    from dane_visual_feature_extraction_worker_spark.plans.driver_queries import (
        QUERIES,
    )
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="plan_nvr_")
    _events(spark).write.mode("overwrite").parquet(
        os.path.join(tmp, "events.parquet")
    )
    try:
        p = _plan(QUERIES["new_vs_returning"](spark, tmp))
        assert "Join" not in p, p
        assert p.count("Exchange hashpartitioning") <= 3, p
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_activity_grid_corpus_collapses_before_share_window(spark):
    """The unpartitioned share window must sit ABOVE the ≤168-cell
    aggregate — i.e. the corpus-side aggregate appears below the
    window in the plan, so the single-partition frame is grid-sized."""
    from dane_visual_feature_extraction_worker_spark.plans.driver_queries import (
        QUERIES,
    )
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="plan_grid_")
    _events(spark).write.mode("overwrite").parquet(
        os.path.join(tmp, "events.parquet")
    )
    try:
        p = _plan(QUERIES["activity_grid"](spark, tmp))
        assert "Window" in p and "HashAggregate" in p, p
        # the window's input is the aggregated cell frame, not the scan:
        # a corpus-level Window would precede any aggregate in the tree
        first_window = p.index("Window")
        assert "HashAggregate" in p[first_window:], p
        assert "Join" not in p, p
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
