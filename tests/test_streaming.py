"""Streaming twins produce the same session/tumbling rollups as batch
when run over the same bounded input with trigger(availableNow)."""

from __future__ import annotations

import pandas as pd

from dane_visual_feature_extraction_worker_spark.operators.sessionize import session_stats
from dane_visual_feature_extraction_worker_spark.streaming.windows import (
    streaming_session_stats,
)


def test_streaming_sessionize_matches_batch(spark, transcripts, tmp_path):
    src = str(tmp_path / "stream_src")
    transcripts.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(transcripts.schema).parquet(src)
    q = (
        streaming_session_stats(stream, gap_seconds=1800.0)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = (
        spark.table("sess_stream")
        .toPandas()
        .sort_values(["conv_id", "start_ts"])
        .reset_index(drop=True)
    )
    ref = (
        session_stats(transcripts, 1800.0, order=["ts", "turn_idx"])
        .toPandas()
        .sort_values(["conv_id", "start_ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(
        got[["conv_id", "n_turns", "start_ts", "end_ts"]],
        ref[["conv_id", "n_turns", "start_ts", "end_ts"]],
        check_dtype=False,
    )


def test_streaming_sessionize_exact_gap_boundary(spark, tmp_path):
    """Rows exactly gap_seconds apart stay IN-session in the batch
    operator (strict >); the streaming twin uses gap+1µs so
    session_window agrees (ADVICE r1 boundary divergence)."""
    import pyspark.sql.functions as F

    rows = [("c", 0, 0), ("c", 1, 1800), ("c", 2, 3601)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts long"
    ).select("conv_id", "turn_idx", F.timestamp_seconds("ts").alias("ts"))

    batch = (
        session_stats(df, gap_seconds=1800.0)
        .orderBy("session_id")
        .collect()
    )
    assert [r["n_turns"] for r in batch] == [2, 1]

    src = str(tmp_path / "gap_src")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        streaming_session_stats(stream, gap_seconds=1800.0)
        .writeStream.format("memory")
        .queryName("gap_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["n_turns"] for r in spark.table("gap_stream").collect()
    )
    assert got == [1, 2]


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: state must SURVIVE across micro-batches
    and restarts (same checkpoint dir) — batch 2's totals include batch
    1's rows, matching a batch aggregate over the union."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.streaming.stateful import (
        running_totals,
    )

    src = str(tmp_path / "state_src")
    ckpt = str(tmp_path / "state_ckpt")
    b1 = spark.createDataFrame(
        [("a", 0, "hello", 10), ("a", 1, "world!", 20), ("b", 0, "x", 30)],
        "conv_id string, turn_idx int, text string, t long",
    ).select("conv_id", "turn_idx", "text", F.timestamp_seconds("t").alias("ts"))
    b1.write.mode("overwrite").parquet(src)

    def run_pass():
        # memory sink cannot recover from a checkpoint; foreachBatch can
        rows: dict = {}

        def sink(batch_df, _epoch):
            for r in batch_df.collect():
                rows[r["entity"]] = (r["n_turns"], r["chars_total"])

        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = (
            running_totals(stream, entity="conv_id", ts="ts", text="text")
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return rows

    got1 = run_pass()
    assert got1["a"] == (2, 11) and got1["b"] == (1, 1)

    # batch 2 arrives later; a NEW query with the SAME checkpoint resumes
    # the state store (only new files are processed, totals accumulate)
    b2 = spark.createDataFrame(
        [("a", 2, "again", 40), ("c", 0, "new", 50)],
        "conv_id string, turn_idx int, text string, t long",
    ).select("conv_id", "turn_idx", "text", F.timestamp_seconds("t").alias("ts"))
    b2.write.mode("append").parquet(src)
    got2 = run_pass()
    assert got2["a"] == (3, 16)  # 11 + len("again")
    assert got2["c"] == (1, 3)


def test_append_mode_session_sink_equals_batch(spark, tmp_path):
    """Watermark-flush append mode: every real session emitted exactly
    once to the file sink, sentinel sessions never appear, result set
    equals the batch sessionizer."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.sessionize import (
        sessionize,
    )
    from dane_visual_feature_extraction_worker_spark.streaming.windows import (
        session_sink_append,
    )

    rows = []
    for u in range(5):
        t0 = 1_700_000_000 + u * 10
        # two sessions per user: 3 events, then a > gap jump, then 2
        for i in range(3):
            rows.append((u * 100 + i, t0 + i * 60, u))
        for i in range(2):
            rows.append((u * 100 + 50 + i, t0 + 10_000 + i * 60, u))
    src = spark.createDataFrame(
        [(e, float(ts), u) for e, ts, u in rows], "event_id long, sec double, user_id long"
    ).select("event_id", F.timestamp_seconds("sec").alias("ts"), "user_id")
    src_dir = str(tmp_path / "src")
    src.write.mode("overwrite").parquet(src_dir)

    max_ts = src.agg(F.max("ts")).collect()[0][0]
    flush = src.select("user_id").distinct().select(
        F.lit(-1).cast("bigint").alias("event_id"),
        (F.lit(max_ts) + F.expr("INTERVAL 12000 SECONDS")).alias("ts"),
        "user_id",
    )
    flush_dir = str(tmp_path / "flush")
    flush.write.mode("overwrite").parquet(flush_dir)

    schema = spark.read.parquet(src_dir).schema
    session_sink_append(
        spark.readStream.schema(schema).parquet(src_dir),
        spark.readStream.schema(schema).parquet(flush_dir),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
        gap_seconds=1800.0,
        entity="user_id",
        ts="ts",
        watermark="1 hour",
    )
    got = spark.read.parquet(str(tmp_path / "sink"))
    assert got.count() == 10  # 2 sessions x 5 users, no sentinel rows
    assert got.where(F.col("n_turns") == 1).count() == 0  # no sentinels
    batch = sessionize(
        spark.read.parquet(src_dir), gap_seconds=1800.0, entity="user_id", ts="ts"
    )
    b = (
        batch.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_turns"), F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
        .select("user_id", "n_turns", "start_ts", "end_ts")
    )
    a = {tuple(r) for r in got.collect()}
    assert a == {tuple(r) for r in b.collect()}


def test_streaming_dedup_first_matches_batch_distinct(spark, tmp_path):
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.streaming.dedup import (
        dedup_sink_append,
    )

    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    for u in range(5):
        for k in range(20):  # 4 duplicates of each of 5 keys per user
            rows.append((base + pd.Timedelta(seconds=k * 7), u, f"k{k % 5}"))
    src = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "user_id", "key"])
    )
    src_dir = str(tmp_path / "src")
    src.write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    dedup_sink_append(
        spark.readStream.schema(schema).parquet(src_dir),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
        keys=["user_id", "key"],
        ts="ts",
        watermark="1 hour",
    )
    got = spark.read.parquet(str(tmp_path / "sink"))
    assert got.columns == ["user_id", "key"]
    a = {tuple(r) for r in got.collect()}
    b = {
        tuple(r)
        for r in spark.read.parquet(src_dir)
        .select("user_id", "key")
        .distinct()
        .collect()
    }
    assert a == b and len(a) == 25


def test_streaming_dedup_resumes_from_checkpoint(spark, tmp_path):
    """State survives a restart: keys deduped in run 1 must NOT re-emit
    when run 2 sees them again from new files (same checkpoint)."""
    from dane_visual_feature_extraction_worker_spark.streaming.dedup import (
        dedup_sink_append,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    src_dir = str(tmp_path / "src")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    batch1 = spark.createDataFrame(
        pd.DataFrame(
            [(base, 1, "a"), (base + pd.Timedelta(seconds=1), 1, "b")],
            columns=["ts", "user_id", "key"],
        )
    )
    batch1.write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    run = lambda: dedup_sink_append(  # noqa: E731
        spark.readStream.schema(schema).parquet(src_dir),
        sink,
        ckpt,
        keys=["user_id", "key"],
        ts="ts",
        watermark="10 minutes",
    )
    run()
    assert spark.read.parquet(sink).count() == 2
    # second run: one duplicate of "a" (inside the watermark) + one new
    batch2 = spark.createDataFrame(
        pd.DataFrame(
            [
                (base + pd.Timedelta(seconds=2), 1, "a"),
                (base + pd.Timedelta(seconds=3), 1, "c"),
            ],
            columns=["ts", "user_id", "key"],
        )
    )
    batch2.write.mode("append").parquet(src_dir)
    run()
    got = sorted(
        tuple(r) for r in spark.read.parquet(sink).collect()
    )
    assert got == [(1, "a"), (1, "b"), (1, "c")]


def test_stream_static_enrich_matches_batch_join(spark, tmp_path):
    """availableNow stream-static broadcast join == the batch join on
    the same inputs; unmatched stream rows drop (inner join)."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.streaming.enrich import (
        enrich_sink_append,
    )

    src = str(tmp_path / "src")
    ev = spark.createDataFrame(
        [(i, i % 3, i) for i in range(30)],
        "event_id long, user_id long, sec long",
    ).select("event_id", "user_id", F.timestamp_seconds("sec").alias("ts"))
    ev.write.parquet(src)
    dim = spark.createDataFrame(
        [(0, "alpha"), (1, "beta")], "user_id long, tag string"
    )  # user 2 absent: its rows must drop
    stream = spark.readStream.schema(ev.schema).parquet(src)
    enrich_sink_append(
        stream, dim, on="user_id",
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = sorted(
        (r["event_id"], r["tag"])
        for r in spark.read.parquet(str(tmp_path / "sink")).collect()
    )
    want = sorted(
        (r["event_id"], r["tag"])
        for r in ev.join(dim, "user_id").collect()
    )
    assert got == want and len(got) == 20


def test_streaming_near_dup_finds_cross_batch_pairs(spark, tmp_path):
    """Docs 100 and 200 are near-dups of each other but arrive in
    DIFFERENT micro-batches: the pair must be found through the
    index-append path, not the within-batch self-join. Also: corpus x
    stream pairs land, disjoint docs never pair."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dup_index_build,
    )
    from dane_visual_feature_extraction_worker_spark.streaming.dedup import (
        near_dup_probe_sink,
    )

    dup = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, dup), (2, "some totally unrelated corpus text body here")],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "index")
    near_dup_index_build(corpus, index_dir)

    delta = spark.createDataFrame(
        [(100, dup), (200, dup), (300, "nothing shared with anyone at all")],
        "doc_id long, text string",
    )
    delta_dir = str(tmp_path / "delta")
    # one append-write per doc -> exactly one file and one micro-batch
    # per doc, so (100, 200) CANNOT come from a within-batch self-join
    for i in (100, 200, 300):
        delta.where(F.col("doc_id") == i).coalesce(1).write.mode(
            "append"
        ).parquet(delta_dir)
    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(delta_dir)
    )
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    near_dup_probe_sink(stream, index_dir, sink, ckpt)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(sink).distinct().collect()
    }
    want = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(corpus.unionByName(delta)).collect()
        if r["doc_a"] >= 100 or r["doc_b"] >= 100
    }
    assert got == want
    assert (100, 200) in got  # the cross-batch pair
    assert (1, 100) in got and (1, 200) in got  # corpus x stream
    assert not any(300 in p for p in got)
