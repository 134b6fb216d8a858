"""Sequence packing: concat-and-chunk token layout for LLM pretraining.

The standard pretraining batch layout concatenates the token streams of
many documents and cuts fixed-length sequences every ``max_tokens``,
letting documents span sequence boundaries — no padding waste, no
per-document bin packing. Distributed, the corpus is first split into
``n_shards`` hash shards (engine-portable md5 key, the
operators/sampling.py primitive, so shard membership is reproducible on
any engine / partition layout); within a shard the stream order is
``doc_id`` and every position is pure integer window math:

    tok_offset(doc) = sum(n_tokens) over docs before it in the shard
    seq_first       = tok_offset DIV max_tokens
    seq_last        = (tok_offset + n_tokens - 1) DIV max_tokens
    pack_offset     = tok_offset MOD max_tokens

Scale shape: ONE shuffle (hash on shard) + one per-shard sort by
doc_id; the running sum is a whole-stage-codegen window over bigints
(exact — no float anywhere), so any SQL engine replays it
bit-for-bit. Shard count bounds per-task stream length (pick
n_shards ≈ corpus_tokens / 10^8 at 100 TB); packing is embarrassingly
parallel across shards and adding shards never reassigns existing
docs' shard membership (md5 key mod), only rebalances new layouts.

Reference provenance: the layout mirrors the reference's fixed-shape
batch assembly (it stacks per-item tensors into fixed batches,
feature_extraction.py:26-31); here the "items" are token runs and the
fixed shape is the training sequence length.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from dane_visual_feature_extraction_worker_spark.operators.sampling import (
    sample_key,
)
from dane_visual_feature_extraction_worker_spark.operators.textstats import (
    _tokens,
)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 1024,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """Per-document packing coordinates under concat-and-chunk.

    Emits ``(doc_id, shard, n_tokens, tok_offset, seq_first, seq_last,
    pack_offset)``: which training sequences the doc's tokens land in
    and where. Tokenizer = the shared whitespace tokenizer (so counts
    agree with ``token_stats`` and the DuckDB oracles)."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    shard = F.pmod(sample_key(F.col(id_col), salt), F.lit(n_shards)).cast(
        "int"
    )
    d = docs.select(
        F.col(id_col),
        shard.alias("shard"),
        F.size(_tokens(text_col)).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "tok_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    # empty docs occupy zero tokens: they "land" at their offset's
    # sequence with seq_last == seq_first (greatest(n_tokens, 1));
    # all positions are nonnegative bigints, DIV/MOD exact everywhere
    d = d.withColumn(
        "__span_end",
        F.col("tok_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1,
    )
    return d.select(
        id_col,
        "shard",
        "n_tokens",
        "tok_offset",
        F.expr(f"tok_offset DIV {max_tokens}").alias("seq_first"),
        F.expr(f"__span_end DIV {max_tokens}").alias("seq_last"),
        F.pmod(F.col("tok_offset"), F.lit(max_tokens))
        .cast("bigint")
        .alias("pack_offset"),
    )


def shard_summary(packed: DataFrame, max_tokens: int = 1024) -> DataFrame:
    """Per-shard totals: docs, tokens, and the number of full training
    sequences the shard yields (ceil(tokens / max_tokens)) — the
    shard-balance audit a packing job runs before writing batches."""
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_shard_tokens"),
        F.expr(
            f"(sum(n_tokens) + {max_tokens - 1}) DIV {max_tokens}"
        ).alias("n_sequences"),
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping fixed-window chunking: split each document's token
    stream into windows of ``window`` tokens starting every ``stride``
    tokens (overlap = window - stride), the standard long-document →
    context-window preprocessing for embedding / retrieval corpora.

    Emits ``(doc_id, chunk_id, tok_start, n_tokens, chunk_md5)`` — one
    row per chunk, md5 of the space-rejoined token slice so oracles can
    replay the exact chunk text without shipping it. Zero-token
    documents yield zero chunks; every other document's last chunk is
    the unique (possibly short) one whose window reaches the final
    token, so chunk count is ``1 + ceil((n - window) / stride)`` —
    every token lands in >= 1 chunk and no chunk is a suffix of a
    previous one.

    Scale shape: narrow map over the scan (tokenize once, explode an
    int sequence, slice the cached array) — no shuffle, no UDF; the
    explode fans out ~n/stride rows per doc, all whole-stage codegen.
    Chunk identity is (doc_id, chunk_id), reproducible on any engine /
    partition layout.

    Reference provenance: mirrors the reference's fixed-size frame
    windows over media streams (keyframe extraction takes one frame
    per fixed interval, data_handling.py); here the stream is tokens
    and windows overlap for retrieval-context continuity.
    """
    if window <= 0 or stride <= 0:
        raise ValueError(f"window/stride must be positive, got {window}/{stride}")
    if stride > window:
        raise ValueError(
            f"stride > window leaves token gaps ({stride} > {window})"
        )
    toked = docs.select(
        F.col(id_col), _tokens(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    # n_chunks = 1 + ceil((n - window)/stride), integer-exact via DIV
    n_chunks = F.when(F.col("__n") <= window, F.lit(1)).otherwise(
        F.expr(f"(__n - {window} + {stride} - 1) DIV {stride}") + 1
    )
    chunks = (
        toked.where(F.col("__n") > 0)
        .withColumn(
            "chunk_id",
            F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)),
        )
        .withColumn("tok_start", (F.col("chunk_id") * stride).cast("bigint"))
        .withColumn(
            "__slice",
            F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, window),
        )
    )
    return chunks.select(
        id_col,
        F.col("chunk_id").cast("int"),
        "tok_start",
        F.size("__slice").cast("bigint").alias("n_tokens"),
        F.md5(F.array_join("__slice", " ")).alias("chunk_md5"),
    )


def span_corrupt(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 3,
    mask_rate: float = 0.15,
    salt: str = "t5",
) -> DataFrame:
    """T5-style span corruption → ``(id, input_text, target_text,
    n_spans)``: the denoising-objective training transform.  Tokens are
    grouped into fixed ``span_tokens`` runs; each run is masked iff its
    portable hash ``md5(salt|id|group)`` (the operators/sampling.py
    32-bit key) falls under ``mask_rate`` — DETERMINISTIC masking, the
    property that makes the example set reproducible across engines,
    reruns, and repartitioning (seeded rand() is none of those).  A
    masked run collapses to one ``<extra_id_K>`` sentinel in the input;
    the target is the sentinel-prefixed masked spans in order, closed
    with the final sentinel, exactly the T5 layout.

    Sentinel numbering K is a per-document running count of masked runs
    in position order — ONE exchange on the document key; the final
    reassembly groupBy reuses that partitioning (no second corpus
    shuffle), and the order-stable concat is sort_array over (pos,
    piece) structs, never a nondeterministic collect_list.  Documents
    with zero masked runs emit n_spans = 0 with target just the closing
    sentinel — kept, so the output row set equals the non-empty input
    row set.
    """
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        SAMPLE_SPACE,
    )

    thr = int(mask_rate * SAMPLE_SPACE)
    toks = docs.select(
        F.col(id_col),
        F.posexplode(_tokens(text_col)).alias("pos", "tok"),
    ).withColumn("__g", (F.col("pos") / span_tokens).cast("bigint"))
    key = sample_key(
        F.concat_ws("#", F.col(id_col).cast("string"), F.col("__g")),
        salt=salt,
    )
    t = toks.withColumn("__m", (key < F.lit(thr)).cast("int"))
    w = Window.partitionBy(id_col).orderBy("pos")
    # sentinel id: masked runs seen so far (this group's own flag counts
    # only at its first token, so every token of a run shares one K)
    first_of_g = (F.col("pos") % span_tokens == 0) | (F.col("pos") == 0)
    starts = F.sum(
        F.when(first_of_g & (F.col("__m") == 1), 1).otherwise(0)
    ).over(w)
    t = t.withColumn("__k", (starts - F.col("__m")).cast("int"))
    sent = F.concat(F.lit("<extra_id_"), F.col("__k"), F.lit(">"))
    in_piece = F.when(F.col("__m") == 0, F.col("tok")).when(
        first_of_g, sent
    )  # masked non-first tokens -> NULL, dropped by the array filter
    tgt_piece = F.when(
        F.col("__m") == 1,
        F.when(first_of_g, F.concat(sent, F.lit(" "), F.col("tok"))).otherwise(
            F.col("tok")
        ),
    )
    asm = t.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), in_piece.alias("p")))
                ),
                lambda s: s["p"],
            ),
            " ",
            # null pieces (masked continuation tokens) are skipped via
            # the null_replacement-free array_join after a filter:
        ).alias("__in_raw"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            tgt_piece.isNotNull(),
                            F.struct(F.col("pos"), tgt_piece.alias("p")),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
            " ",
        ).alias("__tgt_raw"),
        F.max(F.col("__k") + F.col("__m")).cast("int").alias("n_spans"),
    )
    closing = F.concat(F.lit("<extra_id_"), F.col("n_spans"), F.lit(">"))
    target = F.when(
        F.col("__tgt_raw") == "", closing
    ).otherwise(F.concat(F.col("__tgt_raw"), F.lit(" "), closing))
    return asm.select(
        id_col,
        F.col("__in_raw").alias("input_text"),
        target.alias("target_text"),
        "n_spans",
    )


def packing_stats(
    docs: DataFrame,
    max_tokens: int = 1024,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """Per-shard packing-efficiency report for ``pack_sequences``'s
    concat-and-chunk layout (same shard hash, same tokenizer): how many
    training sequences each shard emits and how full they are —
    ``fill = total_tokens / (n_seqs · max_tokens)`` — the number that
    tells you whether max_tokens/n_shards are wasting step budget
    before a training run is launched.

    Under concat-and-chunk the sequence count is exactly
    ``ceil(total_tokens / max_tokens)`` per shard, so the report needs
    only the per-shard token SUM — never the per-doc offsets:
    n_seqs = (total + max_tokens − 1) DIV max_tokens, fill is the
    integer micro quotient total·1e6 DIV (n_seqs·max_tokens). Exact
    int64 end to end (10^12-token shards sit far below the bound).

    Plan: narrow token-count projection fused into the scan, ONE
    map-side-combined groupBy on the md5 shard key (uniform by
    construction — skew-free) → |shards| rows. The corpus shuffles
    only combined per-shard partials.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    shard = F.pmod(sample_key(F.col(id_col), salt), F.lit(n_shards)).cast(
        "int"
    )
    per = (
        docs.select(
            shard.alias("shard"),
            F.size(_tokens(text_col)).cast("bigint").alias("__n"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__n").cast("bigint").alias("n_tokens"),
        )
    )
    n_seqs = F.expr(f"(n_tokens + {max_tokens - 1}) div {max_tokens}").cast(
        "bigint"
    )
    return per.select(
        "shard",
        "n_docs",
        "n_tokens",
        n_seqs.alias("n_seqs"),
        # an all-empty shard has n_seqs = 0: NULL fill on BOTH engines
        # (DuckDB //0 errors where Spark div yields NULL — guard it)
        F.when(
            F.col("n_tokens") > 0,
            F.expr(
                f"(n_tokens * 1000000) div "
                f"(((n_tokens + {max_tokens - 1}) div {max_tokens})"
                f" * {max_tokens})"
            ).cast("double")
            / 1e6,
        ).alias("fill"),
    )
