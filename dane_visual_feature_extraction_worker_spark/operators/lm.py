"""Bigram language-model quality scoring — the CCNet/Gopher-style
perplexity filter, self-trained on the corpus it scores.

Web-scale curation pipelines score every document with a small n-gram
LM and drop the high-perplexity tail (boilerplate, gibberish, OCR
noise); the reference worker has no text-quality surface at all (it
scores media frames, reference worker.py:60-74), but any transcript
corpus feeding a trainer needs this gate.  This module trains the LM
and scores the corpus in ONE job: corpus bigram counts are the model,
per-document mean negative log-likelihood under add-one smoothing is
the score.

Exactness discipline (the psi_drift / bm25 pattern, stats.py /
retrieval.py): with add-one smoothing the per-bigram NLL is

    -ln p(w2|w1) = ln(c(w1,*) + V) - ln(c(w1,w2) + 1)

— every log is of a BARE INTEGER, so both terms floor-scale to exact
int64 micro-nats that any SQL engine reproduces bit-for-bit.  Per-doc
sums stay in int64 (<= 1e4 bigrams x ~2e7 micro-nats << 2^53); the
single double divide by the bigram count is exact-operand, floored to
1e-6.  V is the CONTEXT vocabulary (distinct bigram-first tokens) —
one row of the count table we already built, not a second corpus scan.

Plan at 10^12 turns: explode compresses to per-doc bigram TFs first
(map-side combined groupBy, exchange 1), the model tables are rollups
of THAT frame (distinct-bigram-sized, exchanges 2-3 over shrinking
frames), c1 and V are attached to the bigram table before the one
corpus-sized model join (exchange 4 on (w1, w2)), and the per-doc
reduce rides exchange 5.  Nothing quadratic, no collect: V crosses as
a lazy broadcast scalar.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _lnm(c: F.Column) -> F.Column:
    """floor(ln(int) * 1e6) as int64 — integer micro-nats."""
    return F.floor(F.log(c.cast("double")) * 1e6).cast("bigint")


def doc_bigrams(
    docs: DataFrame,
    tokens_col: F.Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram term frequencies ``(id, w1, w2, tf)``: the
    zip-with-shifted-self bigram build is pure codegen (no UDF), and
    the groupBy compresses in-doc repeats before anything wide."""
    t = tokens_col
    n = F.size(t)
    bg = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        docs.select(F.col(id_col), F.explode(bg).alias("__b"))
        .select(id_col, F.col("__b.w1").alias("w1"), F.col("__b.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def bigram_lm_scores(
    docs: DataFrame,
    tokens_col: F.Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with a corpus-trained add-one bigram LM →
    ``(id, n_bigrams, avg_nll)``; higher avg_nll = less corpus-typical
    text (the perplexity-filter ranking key, ppl = e^avg_nll —
    monotone, so the exponential is never computed).  Documents with
    fewer than 2 tokens have no bigrams and are dropped.

    avg_nll is exact int64 micro-nat arithmetic until one final
    exact-operand double divide, floored to 1e-6 — replayable
    bit-for-bit by the SQL oracle.
    """
    b = doc_bigrams(docs, tokens_col, id_col=id_col)
    c12 = b.groupBy("w1", "w2").agg(F.sum("tf").cast("bigint").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    vocab = c1.agg(F.count(F.lit(1)).cast("bigint").alias("__v"))
    # model table: bigram -> (c12, c1, V); distinct-bigram-sized
    model = c12.join(c1, "w1").crossJoin(F.broadcast(vocab))
    nll = F.col("tf") * (
        _lnm(F.col("c1") + F.col("__v")) - _lnm(F.col("c12") + 1)
    )
    per_doc = (
        b.join(model, ["w1", "w2"])
        .select(F.col(id_col), nll.alias("__nll"), F.col("tf"))
        .groupBy(id_col)
        .agg(
            F.sum("__nll").alias("__micro"),
            F.sum("tf").cast("bigint").alias("n_bigrams"),
        )
    )
    avg = F.floor(
        F.col("__micro").cast("double") / F.col("n_bigrams").cast("double")
    ) / 1e6
    return per_doc.select(id_col, "n_bigrams", avg.alias("avg_nll"))
