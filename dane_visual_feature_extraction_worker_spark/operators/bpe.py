"""Distributed BPE-style merge training over word tokens — the
word2phrase / tokenizer-training primitive, as a Spark job.

Classic BPE alternates two steps R times: (1) count ADJACENT TOKEN
PAIRS over the whole corpus and pick the most frequent, (2) merge
every non-overlapping occurrence of that pair greedily left-to-right.
Step 1 is a map-side-combined aggregate; step 2 is where naive ports
die — the greedy merge looks sequential.  Two facts make it
distributed and exactly replayable:

- The merge is PER-DOCUMENT and pure: each document's token array
  folds independently (no cross-document state), so step 2 is a
  NARROW codegen ``aggregate()`` over the array column — zero
  shuffles, zero Python.
- Greedy left-to-right equals a closed form: among each maximal run
  of consecutive candidate positions, exactly the 1st, 3rd, 5th, ...
  merge.  That run-parity formulation is pure window algebra, which is
  how the DuckDB oracle replays the fold without any sequential loop
  — the gate therefore PROVES the fold implements greedy semantics.

Per round the plan is: one pair-count aggregate (the only exchange; at
10^12 tokens the shuffle carries (pair, partial) cells, not the pair
stream), ONE scalar driver collect for the winning pair (the Lloyd /
connected-components scalar-per-round precedent), one narrow re-fold
of the corpus.  Ties break (count desc, left asc, right asc) so every
engine picks the same pair.  Merged tokens join with '_'; the fold's
internal no-pending sentinel is the EMPTY string, which the tokenizer
can never emit (it splits on whitespace and drops empties,
textstats._tokens).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SENT = ""


def pair_counts(toks: DataFrame, tokens_col: str = "toks") -> DataFrame:
    """Corpus adjacent-pair counts ``(l, r, n)`` from an array column —
    the zip-with-shifted-self bigram build (all occurrences count,
    overlapping included: classic BPE statistics)."""
    t = F.col(tokens_col)
    n = F.size(t)
    bg = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        toks.select(F.explode(bg).alias("__p"))
        .groupBy(F.col("__p.l").alias("l"), F.col("__p.r").alias("r"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def merge_pair(tokens_col: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right non-overlapping merge of (left, right) in a
    token array → new token array: a single codegen ``aggregate`` fold
    carrying (result-so-far, pending token) — narrow, no UDF."""
    merged = F.lit(f"{left}_{right}")
    init = F.struct(
        F.array().cast("array<string>").alias("arr"),
        F.lit(_SENT).alias("pend"),
    )

    def step(acc, x):
        hit = (acc["pend"] == F.lit(left)) & (x == F.lit(right))
        flushed = F.when(
            acc["pend"] == F.lit(_SENT), acc["arr"]
        ).otherwise(F.concat(acc["arr"], F.array(acc["pend"])))
        return F.when(
            hit,
            F.struct(
                F.concat(acc["arr"], F.array(merged)).alias("arr"),
                F.lit(_SENT).alias("pend"),
            ),
        ).otherwise(F.struct(flushed.alias("arr"), x.alias("pend")))

    def finish(acc):
        return F.when(acc["pend"] == F.lit(_SENT), acc["arr"]).otherwise(
            F.concat(acc["arr"], F.array(acc["pend"]))
        )

    return F.aggregate(tokens_col, init, step, finish)


def bpe_merge_rounds(
    toks: DataFrame,
    rounds: int = 3,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Run ``rounds`` BPE merge rounds → (merged corpus, merge table).

    Returns the corpus with ``tokens_col`` rewritten after all rounds,
    plus the learned merges [(left, right, count)] in order.  Raises if
    the corpus runs out of repeated pairs before ``rounds`` — a
    truncated merge table would silently change tokenizer behavior.
    Each round's merged corpus is localCheckpoint-ed (the
    connected_components / Lloyd lineage discipline): the count pass
    and the NEXT round's fold both read it, and without truncation
    round r re-evaluates r chained folds from the source per pass.
    """
    merges: list[tuple[str, str, int]] = []
    cur = toks
    for _ in range(rounds):
        top = (
            pair_counts(cur, tokens_col)
            .orderBy(F.desc("n"), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            raise ValueError(
                f"corpus exhausted after {len(merges)} merges; "
                f"asked for {rounds}"
            )
        l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((l, r, n))
        cur = cur.withColumn(
            tokens_col, merge_pair(F.col(tokens_col), l, r)
        ).localCheckpoint()
    return cur, merges
