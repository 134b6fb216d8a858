"""Curation-reporting batch: stopword discovery, per-source dataset
cards, near-dup cluster-size histogram."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_stopword_discovery_threshold(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        stopword_discovery,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat the mat"),
            (2, "the dog"),
            (3, "the bird cat"),
            (4, "fish"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["term"]: (r["df"], r["share"])
        for r in stopword_discovery(df, min_share=0.5).collect()
    }
    # 'the' in 3/4 docs (in-doc repeats count once), 'cat' in 2/4
    assert got == {"the": (3, 0.75), "cat": (2, 0.5)}


def test_dataset_card_fields(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        dataset_card,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c", "en", "web"),
            (2, "a b c", "en", "web"),   # exact dup of 1
            (3, "d e", "fr", "web"),
            (4, "x", "en", "books"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["source"]: r for r in dataset_card(df).collect()}
    web = got["web"]
    assert (web["n_docs"], web["n_tokens"], web["n_langs"]) == (3, 8, 2)
    assert web["n_exact_dups"] == 1
    assert web["dup_ratio"] == 0.333333  # floor(1/3 * 1e6)/1e6
    assert web["mean_chars"] == 4.333333  # floor(13/3 * 1e6)/1e6
    books = got["books"]
    assert (books["n_docs"], books["n_exact_dups"]) == (1, 0)


def test_dup_cluster_histogram(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        connected_components,
    )

    # components {1,2,3}, {4,5}, {6}, {7}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    cc = connected_components(pairs, nodes)
    sz = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    hist = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in sz.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("cluster_size").cast("bigint").alias("n_docs"),
        )
        .collect()
    }
    assert hist == {3: (1, 3), 2: (1, 2), 1: (2, 2)}


def test_weak_label_vote_majority_and_abstain(spark):
    from dane_visual_feature_extraction_worker_spark.operators.labels import (
        weak_label_vote,
    )

    rules = [("a", "x"), ("b", "x"), ("c", "y"), ("d", "z")]
    df = spark.createDataFrame(
        [
            (1, ["a", "b", "c"]),     # x:2 y:1 -> x
            (2, ["a", "a", "c"]),     # presence: x:1 y:1 -> tie, abstain
            (3, ["d"]),               # z:1 -> z
            (4, ["q"]),               # no rule hit -> absent
        ],
        "doc_id long, toks array<string>",
    )
    got = {
        r["doc_id"]: (r["label"], r["n_votes"], r["n_rules_hit"])
        for r in weak_label_vote(df, F.col("toks"), rules).collect()
    }
    assert got == {1: ("x", 2, 3), 2: (None, 1, 2), 3: ("z", 1, 1)}


def test_last_touch_attribution_literal(spark):
    from datetime import datetime

    import __spark_entry__  # noqa: F401  (pattern parity; op is inline)
    from pyspark.sql import Window

    rows = [
        (1, 1, "click", '{"k": 7}', 0.0, datetime(2024, 1, 1)),
        (1, 2, "purchase", '{"k": 0}', 5.0, datetime(2024, 1, 2)),
        (1, 3, "click", '{"k": 9}', 0.0, datetime(2024, 1, 3)),
        (1, 4, "purchase", '{"k": 0}', 3.0, datetime(2024, 1, 4)),
        (2, 5, "purchase", '{"k": 0}', 2.0, datetime(2024, 1, 5)),
    ]
    e = spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, props string,"
        " value double, ts timestamp",
    )
    camp = F.when(
        F.col("event_type") == "click",
        F.get_json_object("props", "$.k").cast("bigint"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        r["campaign"]: (r["n"], r["rev"])
        for r in e.select(
            "event_type",
            "value",
            F.last(camp, ignorenulls=True).over(w).alias("campaign"),
        )
        .where(F.col("event_type") == "purchase")
        .groupBy("campaign")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
        )
        .collect()
    }
    assert got == {7: (1, 5.0), 9: (1, 3.0), None: (1, 2.0)}


def test_minhash_calibration_identical_docs(spark):
    """Identical documents: all 8 seeds agree, exact Jaccard 1.0; a
    completely different doc never enters the candidate set."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        minhash_calibration,
    )

    txt = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, txt), (2, txt), (3, "zz yy xx ww vv uu tt ss rr qq pp oo")],
        "doc_id long, text string",
    )
    rows = minhash_calibration(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["agree_seeds"] == 8
    assert r["est_jaccard"] == 1.0
    assert r["exact_jaccard"] == 1.0


def test_woe_sign_sanity(spark):
    """A bucket where purchases are over-represented gets positive
    WOE; under-represented gets negative — computed via the gated
    query on the sf0.001 events table."""
    import __spark_entry__ as entry

    rows = entry.queries()["woe_encoding"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    tot_pos = sum(r["n_pos"] for r in rows)
    tot_neg = sum(r["n_neg"] for r in rows)
    for r in rows:
        # smoothed WOE must track the raw rate direction except at the
        # smoothing floor
        if r["n_pos"] * tot_neg > 2 * r["n_neg"] * tot_pos:
            assert r["woe"] > 0


def test_lsh_recall_exact_bounds(spark):
    """recall in [0,1]; n_hits <= min(n_exact, n_approx); and with
    n_bits=0-equivalent (every vector in one bucket) recall == 1."""
    import numpy as np

    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        lsh_recall_report,
    )

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.normal(size=64)]) for i in range(80)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    got = {r["qid"]: r for r in lsh_recall_report(e, q, k=5, n_bits=4).collect()}
    assert set(got) == {0, 1, 2}
    for r in got.values():
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_hits"] <= min(r["n_exact"], r["n_approx"])
    # one-bucket LSH (n_bits=1 gives 2 buckets; use a constant-sign
    # dimension trick instead: all vectors positive on every hyperplane
    # is not constructible here, so assert the exact-side invariant)
    ones = {r["qid"]: r for r in
            lsh_recall_report(e, q, k=80, n_bits=1).collect()}
    for r in ones.values():
        assert r["n_exact"] == 79  # self excluded, k >= corpus
