"""Similarity search over embedding columns.

Direct generalization of the reference's vector-search example
(misc/vector_search_example/vec_example_np.py:13-23: normalize,
dot-product against a 1M-vector table, argsort desc, head 10; torch
twin vec_example_th.py:16-24).

- ``topk_cosine``: brute-force scan — the correctness baseline. The
  query vector is broadcast (one row), the dot product runs JVM-side
  via ``zip_with``/``aggregate`` in double (sequential fold, so an
  oracle can reproduce it bit-for-bit). One pass, no shuffle until the
  final top-k (which is a ``TakeOrderedAndProject``, not a full sort).
- ``lsh_bucket``: sign-LSH bucket id from the signs of the first
  ``n_bits`` dimensions — the scale path prunes the scan to the query's
  bucket (IVF-style). Deterministic, engine-portable.
- ``ann_topk``: top-k within the query's LSH bucket.
- ``near_dup_pairs``: all pairs above a cosine threshold *within a
  bucket* — the bucketed self-join replaces the quadratic cross join;
  at 100 TB the bucket count scales with the corpus so each join
  bucket stays bounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Sequential-fold double dot product (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_to_query(
    emb: DataFrame, query: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``cos`` = cosine(row vector, the single query row's vector).

    ``query`` must be a 1-row DataFrame with column ``qe``; it is
    broadcast (the reference holds the query vector in memory on every
    node the same way)."""
    j = emb.crossJoin(F.broadcast(query))
    return j.withColumn(
        "cos",
        _dot(F.col(vec_col), F.col("qe"))
        / (_norm(F.col(vec_col)) * _norm(F.col("qe"))),
    ).drop("qe")


def topk_cosine(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k (excludes nothing; caller filters)."""
    c = cosine_to_query(emb, query, vec_col)
    return (
        c.select(id_col, (F.floor(F.col("cos") * 1e6) / 1e6).alias("cos"))
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def lsh_bucket(vec_col: str = "embedding", n_bits: int = 8) -> F.Column:
    """Sign-LSH bucket: bit i = sign(v[i]) for the first n_bits dims."""
    b = None
    for i in range(n_bits):
        bit = F.when(F.element_at(F.col(vec_col), i + 1) > 0, 1).otherwise(0)
        term = bit * (1 << i)
        b = term if b is None else b + term
    return b.cast("int")


def ann_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
) -> DataFrame:
    """Approximate top-k: scan only the query's sign-LSH bucket."""
    bq = query.select(lsh_bucket("qe", n_bits).alias("bucket"), "qe")
    cand = emb.withColumn("bucket", lsh_bucket(vec_col, n_bits)).join(
        F.broadcast(bq), "bucket"
    )
    c = cand.withColumn(
        "cos",
        _dot(F.col(vec_col), F.col("qe"))
        / (_norm(F.col(vec_col)) * _norm(F.col("qe"))),
    )
    return (
        c.select(id_col, "bucket", (F.floor(F.col("cos") * 1e6) / 1e6).alias("cos"))
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
) -> DataFrame:
    """Embedding near-dup pairs within the same sign-LSH bucket.

    Bucketed self-join (shuffle on bucket) + cosine filter; the
    semantics are 'bucketed near-dup' on both engine and oracle sides."""
    b = emb.withColumn("bucket", lsh_bucket(vec_col, n_bits))
    l = b.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea"), "bucket"
    )
    r = b.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb"), "bucket"
    )
    pairs = l.join(r, "bucket").where(F.col("vec_a") < F.col("vec_b"))
    c = pairs.withColumn(
        "cos", _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    )
    return c.where(F.col("cos") > threshold).select(
        "vec_a", "vec_b", (F.floor(F.col("cos") * 1e6) / 1e6).alias("cos")
    )
