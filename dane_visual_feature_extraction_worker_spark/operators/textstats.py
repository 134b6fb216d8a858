"""Text analysis: language-ID, quality scoring, token stats, fingerprint.

All JVM-side column expressions (no UDFs) — these run per-document in
whole-stage codegen, the cheapest possible path at corpus scale. The
normalization conventions (lower + whitespace split) match the dedup
operators so downstream joins compose.

Reference precedents: hash utility base_util.py:205-206 (fingerprint),
config-driven normalization data_handling.py:62-69 (score weights).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# tiny embedded stopword lists: deterministic, oracle-replicable
EN_STOP = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]
NL_STOP = ["de", "het", "een", "van", "en", "dat", "die", "te", "met", "voor"]


def _tokens(text_col: str = "text") -> F.Column:
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")


def _stop_ratio(tokens: F.Column, stops: list[str]) -> F.Column:
    stop_arr = F.array(*[F.lit(s) for s in stops])
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, t)))
    return F.when(F.size(tokens) > 0, hits / F.size(tokens)).otherwise(F.lit(0.0))


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram-free heuristic language ID: stopword-hit ratio per
    language list; argmax with 0.02 floor else 'unknown'.

    Tokens are materialized into a column first so project-collapse
    cannot re-inline the regex split per reference (see dedup.py)."""
    docs = docs.select(F.col(id_col), _tokens(text_col).alias("__toks"))
    t = F.col("__toks")
    en = _stop_ratio(t, EN_STOP)
    nl = _stop_ratio(t, NL_STOP)
    pred = (
        F.when((en >= nl) & (en > 0.02), F.lit("en"))
        .when((nl > en) & (nl > 0.02), F.lit("nl"))
        .otherwise(F.lit("unknown"))
    )
    return docs.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        (F.floor(en * 1e6) / 1e6).alias("en_ratio"),
        (F.floor(nl * 1e6) / 1e6).alias("nl_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality features + scalar score in [0,1]:
    length band, mean token length band, stopword presence."""
    docs = docs.select(
        F.col(id_col), F.length(F.col(text_col)).alias("__nch"),
        _tokens(text_col).alias("__toks"),
    )
    t = F.col("__toks")
    n_tok = F.size(t)
    n_chars = F.col("__nch")
    avg_tok = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    stop = _stop_ratio(t, EN_STOP)
    score = (
        F.when((n_tok >= 5) & (n_tok <= 5000), 0.4).otherwise(0.0)
        + F.when((avg_tok >= 2.0) & (avg_tok <= 12.0), 0.3).otherwise(0.0)
        + F.when(stop > 0.02, 0.3).otherwise(0.0)
    )
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        (F.floor(avg_tok * 1e6) / 1e6).alias("avg_token_len"),
        (F.floor(stop * 1e6) / 1e6).alias("stop_ratio"),
        (F.floor(score * 1e6) / 1e6).alias("quality"),
    )


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, and a BPE-ish
    regex token count (letter runs / digit runs / single punctuation)."""
    docs = docs.select(
        F.col(id_col),
        _tokens(text_col).alias("__toks"),
        F.regexp_count(
            F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
        ).alias("__bpe"),
    )
    t = F.col("__toks")
    bpe = F.col("__bpe")
    return docs.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        bpe.alias("n_bpeish"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical document fingerprint: md5 of lower + whitespace-collapsed
    + trimmed text (A25 hash precedent, base_util.py:205-206)."""
    canon = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.select(
        F.col(id_col),
        F.md5(canon).alias("fingerprint"),
        F.length(canon).alias("canon_len"),
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary: global term frequencies, top-k by (count desc,
    term asc). One explode + one groupBy — the count aggregate is
    map-side partially combined, so the shuffle carries per-partition
    (term, partial_count) rows, not the token stream; top-k is a
    TakeOrdered, never a full sort of the vocabulary. The
    tokenizer (lower + \\s+ split, empties dropped) matches every other
    text operator so oracles tokenize identically."""
    toks = docs.select(F.explode(_tokens(text_col)).alias("term")).where(
        F.col("term") != ""
    )
    return (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .orderBy(F.desc("n"), F.col("term"))
        .limit(k)
    )


#: scrub patterns — the usual pre-training hygiene trio. Order matters:
#: emails before bare domains would matter if we scrubbed domains; URLs
#: are matched with explicit schemes so email hosts survive.
SCRUB_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "digits16": r"\b\d{16}\b",  # card-number-shaped runs
}


def scrub_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    replacement: str = "<scrubbed>",
) -> DataFrame:
    """PII-style scrubbing: replace emails / URLs / 16-digit runs with a
    token; emit per-pattern match counts + the cleaned text's length.
    Pure `regexp_replace` / `regexp_count` codegen — no UDFs; at corpus
    scale this is a narrow map over the scan."""
    clean = F.col(text_col)
    counts = []
    for name, pat in SCRUB_PATTERNS.items():
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("int").alias(
                f"n_{name}"
            )
        )
        clean = F.regexp_replace(clean, pat, replacement)
    return docs.select(
        F.col(id_col),
        *counts,
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )
