"""Distributed exact linear algebra over embedding columns.

``gram_matrix`` computes the d x d Gramian G = sum_r x_r x_r^T of an
embedding column — the one aggregate behind PCA / whitening /
covariance feature screens (eigendecomposition of G, a d x d driver-side
numpy call, is free once G is exact). The reference ships dense float
feature matrices to a single process (feature_extraction.py batches of
256); at 10^12 rows the only thing that crosses the wire can be
d(d+1)/2 partial sums per partition, never vectors.

Exactness discipline (the label_centroids precedent): float dot-product
sums are order-dependent, so each component is first floor-quantized to
the 2^-24 grid as an int64; every per-row product and every partial sum
is then INTEGER arithmetic — bit-identical on any engine, any layout,
any partition count. Per-term bound |q_i q_j| < 2^48, so a 50k-row
numpy batch partial stays under 2^63 (asserted); cross-batch totals are
summed as decimal(38,0), overflow-proof past 10^12 rows (2^48 x 10^12
~ 2.8e26 << 1e38).

Plan: mapInPandas emits d(d+1)/2 rows per Arrow batch (the vectorized
einsum is the Arrow-batch fast path; per-row posexplode of d^2 products
would shuffle n*d^2 rows before partial agg) + ONE map-side-combined
groupBy on (i, j) — the exchange carries partials, bounded by
|partitions| x d(d+1)/2 regardless of row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SCALE_BITS = 24
_BATCH_CAP = 50_000  # 50k * 2^48 < 2^63: int64 partials cannot wrap


def gram_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact quantized Gramian: rows ``(i, j, gram)`` for i <= j, where
    ``gram = sum_r floor(x_ri * 2^24) * floor(x_rj * 2^24)`` as a
    decimal(38,0) rendered to string (engine-portable; divide by 2^48
    for the float Gramian, see ``pca_components``)."""
    scale = float(1 << _SCALE_BITS)
    src = emb.select(F.col(vec_col).alias("v"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            )
            for lo in range(0, x.shape[0], _BATCH_CAP):
                q = np.floor(x[lo : lo + _BATCH_CAP] * scale).astype(
                    np.int64
                )
                g = q.T @ q  # int64 matmul, exact under the batch cap
                iu, ju = np.triu_indices(g.shape[0])
                yield pd.DataFrame(
                    {
                        "i": iu.astype(np.int32),
                        "j": ju.astype(np.int32),
                        "s": g[iu, ju],
                    }
                )

    parts = src.mapInPandas(partials, schema="i int, j int, s long")
    return parts.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)"))
        .cast("string")
        .alias("gram")
    )


def pca_components(gram_rows, dim: int, n_rows: int, k: int) -> np.ndarray:
    """Driver-side PCA from the exact Gramian: rebuild the symmetric
    d x d second-moment matrix from ``gram_matrix`` output rows (list of
    Row/dict with i, j, gram), descale by 2^48 / n, and return the top-k
    eigenvectors (d x k, descending eigenvalue order). d x d work — for
    d = 64 this is microseconds; the distributed part was the one pass
    that built G."""
    g = np.zeros((dim, dim), dtype=np.float64)
    for r in gram_rows:
        v = float(int(r["gram"])) / float(1 << (2 * _SCALE_BITS))
        g[r["i"], r["j"]] = v
        g[r["j"], r["i"]] = v
    vals, vecs = np.linalg.eigh(g / max(n_rows, 1))
    order = np.argsort(vals)[::-1][:k]
    return vecs[:, order]


def jl_project(
    emb: DataFrame,
    out_dims: int = 8,
    in_dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "jl",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection with a deterministic
    Rademacher matrix (Achlioptas 2001: ±1 entries preserve pairwise
    distances in expectation like Gaussian JL): 64 → 8 dims as a PURE
    NARROW projection — at corpus scale this is the 8× bandwidth cut
    that makes a first-pass ANN/clustering scan memory-bound instead
    of hopeless, with the exact scan refining survivors.

    Exactness (the pq_codes fixed-order-chain discipline): each output
    component is the EXPLICIT left-to-right add chain
    ``±x₀ ± x₁ ± … ± x₆₃`` over float32→double casts — no group-sum
    reassociation anywhere, so any engine replays the identical IEEE
    result — then 1e-6 floor-quantized to int64 micros. The sign
    matrix comes from ``hyperplane_signs`` (md5 parity — pure data,
    embeds as plan literals in Spark AND any SQL oracle).

    Plan: zero exchanges, zero joins, whole-stage codegen — the
    projection fuses into the scan like pq_codes' assignment.
    """
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        hyperplane_signs,
    )

    signs = hyperplane_signs(out_dims, in_dims, seed=seed)
    cols = [F.col(id_col)]
    for j in range(out_dims):
        terms = " + ".join(
            f"({'' if signs[j][d] == 1 else '-'}"
            f"CAST({vec_col}[{d}] AS DOUBLE))"
            for d in range(in_dims)
        )
        cols.append(
            F.expr(f"CAST(floor(({terms}) * 1000000.0) AS BIGINT)").alias(
                f"c{j}"
            )
        )
    return emb.select(*cols)


def cluster_silhouette(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Simplified silhouette score per point against LABEL centroids →
    ``(vec_id, label, a2, b2, silhouette)``: a = distance to the own-
    label centroid, b = distance to the nearest OTHER centroid,
    s = (b − a) / max(a, b) — the standard clustering-quality feature
    (s → 1 well-separated, s < 0 likely mislabeled) at the centroid
    approximation every large-scale evaluator uses (exact silhouette
    is O(n²) pairwise — never the 10^12-row plan).

    Exactness: components are floor-quantized to micro int64s; each
    centroid component is floor(Σq / n) (Σq < 2^53 holds to ~10^9 rows
    per label at unit-scale embeddings — past that, route the divide
    through decimal, noted here on purpose); squared distances are then
    EXACT int64 sums (a2, b2 — the gated integers). The only floats:
    two sqrt's (IEEE correctly-rounded — deterministic, unlike ln) and
    the final divide + 1e-6 floor.

    Plan: the centroid table is ONE map-side-combined posexplode
    aggregate (|labels| x dim groups — the only corpus exchange);
    centroids come back as a CODEBOOK-sized collect (C·d ints — the
    kmeans_centroids precedent) and re-enter the plan as a literal
    array of structs, so the per-point scan is ZERO-shuffle pure
    codegen: transform over the centroid literal + aggregate over
    zip_with for each d², array_min for b². No joins, no second
    exchange, no Python in the hot path.
    """
    xq = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(1e6)).cast("bigint"),
    )
    pts = emb.select(
        F.col(id_col), F.col(label_col).alias("label"), xq.alias("__xq")
    ).where(F.col(vec_col).isNotNull() & F.col(label_col).isNotNull())

    cents = (
        pts.select("label", F.posexplode("__xq").alias("pos", "q"))
        .groupBy("label", "pos")
        .agg(
            F.floor(
                F.sum("q").cast("double") / F.count(F.lit(1)).cast("double")
            )
            .cast("bigint")
            .alias("cq")
        )
    )
    # sort driver-side: .orderBy().collect() pays a range-partitioning
    # sampling pass (an extra job) before the sort — the codebook is
    # |labels|·d rows, trivially sortable after collect
    rows = sorted(cents.collect(), key=lambda r: (r["label"], r["pos"]))
    by_label: dict[int, list[int]] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["cq"])
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("clabel"),
                F.array(*[F.lit(v).cast("bigint") for v in vec]).alias("cvec"),
            )
            for lbl, vec in sorted(by_label.items())
        ]
    )

    d2s = F.transform(
        cent_lit,
        lambda c: F.struct(
            c["clabel"].alias("clabel"),
            F.aggregate(
                F.zip_with(
                    F.col("__xq"), c["cvec"], lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("d2"),
        ),
    )
    scored = pts.select(id_col, "label", d2s.alias("__d"))
    a2 = F.element_at(
        F.filter(F.col("__d"), lambda s: s["clabel"] == F.col("label")), 1
    )["d2"]
    b2 = F.array_min(
        F.transform(
            F.filter(F.col("__d"), lambda s: s["clabel"] != F.col("label")),
            lambda s: s["d2"],
        )
    )
    out = scored.select(
        id_col, "label", a2.alias("a2"), b2.alias("b2")
    )
    a = F.sqrt(F.col("a2").cast("double"))
    b = F.sqrt(F.col("b2").cast("double"))
    return out.select(
        id_col,
        "label",
        "a2",
        "b2",
        F.when(
            F.greatest(a, b) > 0,
            F.floor((b - a) / F.greatest(a, b) * 1e6) / 1e6,
        )
        .otherwise(F.lit(0.0))
        .alias("silhouette"),
    )


def power_iteration_top(
    emb: DataFrame,
    iters: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal-component summary by EXACT-INTEGER power
    iteration over the gated Gramian — "how one-dimensional is this
    embedding space?": ``explained_share_micro`` = λ₁/trace(G) is the
    collapse diagnostic (≈1 means every vector points one way — a
    degenerate encoder; ≈1/d means isotropic).  Runs entirely in
    integer arithmetic so any engine replays it bit for bit: v₀ =
    10⁶·e_{argmax diag}, each round v ← (G·v)·10⁶ DIV max|G·v|
    (truncating division — verified identical in Spark DIV and
    DuckDB //), fixed ``iters`` rounds (the LPA discipline: a
    deterministic round budget, not a float convergence test), then
    the integer Rayleigh quotient λ = (vᵀGv) DIV (vᵀv).

    Plan: ``gram_matrix`` is the one corpus pass (Arrow int64 einsum
    partials, d(d+1)/2-row exchange); the iteration loop runs on the
    d²-row G frame — join + groupBy + 1-row max per round on frames
    that never exceed d² — with G localCheckpoint-pinned once (the
    Lloyd/doc_pagerank lesson).  d = 64 here; the same plan holds to
    d ~ 10⁴ (10⁸-row G) where a driver-side eigensolve stops fitting.

    Output one row: ``(d, iters, lambda_q (decimal string, Gram
    units), explained_share_micro, top_axis)``.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    d38 = "decimal(38,0)"
    g0 = gram_matrix(emb, vec_col=vec_col).select(
        "i", "j", F.col("gram").cast(d38).alias("val")
    )
    full = g0.unionByName(
        g0.where(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "val"
        )
    ).localCheckpoint()
    start = (
        full.where(F.col("i") == F.col("j"))
        .orderBy(F.col("val").desc(), F.col("i").asc())
        .limit(1)
        .select(F.col("i").alias("j"), F.lit(1_000_000).cast("bigint").alias("val"))
    )
    v = start
    # The per-round normalizer max|G·v| comes from a whole-frame window
    # over the d-row product — NOT a crossJoin(broadcast(agg)) of the
    # same lineage, which re-executes the round's join/aggregate subtree
    # a second time and forced a localCheckpoint (one materialization
    # JOB per round) to stop exponential plan growth.  With the window
    # the whole fixed-round loop is ONE linear plan over d-row frames:
    # no per-round checkpoints, no per-round jobs; only G stays pinned.
    # Identical integer DIV semantics (window max == aggregate max).
    from pyspark.sql import Window as _W

    wfull = _W.partitionBy().rowsBetween(
        _W.unboundedPreceding, _W.unboundedFollowing
    )
    for _ in range(iters):
        # v's value column renamed before the join: G carries 'val' too
        raw = (
            full.join(v.withColumnRenamed("val", "__vv"), "j")
            .groupBy("i")
            .agg(F.sum(F.col("val") * F.col("__vv")).cast(d38).alias("raw"))
        )
        v = (
            raw.withColumn("__mx", F.max(F.abs(F.col("raw"))).over(wfull))
            .select(
                F.col("i").alias("j"),
                F.when(
                    F.col("__mx") > 0,
                    F.expr("CAST(raw * 1000000 AS DECIMAL(38,0)) DIV __mx"),
                )
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("val"),
            )
        )
    # one pin AFTER the loop: v feeds both gv and the Rayleigh pairing
    # below, so without this single materialization the whole 8-round
    # chain would re-execute once per consumer.
    v = v.localCheckpoint()
    gv = (
        full.join(v.withColumnRenamed("val", "__vv"), "j")
        .groupBy("i")
        .agg(F.sum(F.col("val") * F.col("__vv")).cast(d38).alias("raw"))
    )
    paired = v.join(gv.withColumnRenamed("i", "j"), "j")
    scal = paired.agg(
        F.sum(F.col("val").cast(d38) * F.col("raw")).cast(d38).alias("__num"),
        F.sum(F.col("val").cast(d38) * F.col("val").cast(d38))
        .cast(d38)
        .alias("__den"),
        F.max(F.struct(F.abs("val").alias("a"), F.col("j").alias("j")))
        .alias("__top"),
        F.count(F.lit(1)).cast("bigint").alias("d"),
    )
    trace = full.where(F.col("i") == F.col("j")).agg(
        F.sum("val").cast(d38).alias("__tr")
    )
    return scal.crossJoin(F.broadcast(trace)).select(
        "d",
        F.lit(iters).cast("bigint").alias("iters"),
        F.expr("CAST(__num DIV __den AS DECIMAL(38,0))")
        .cast("string")
        .alias("lambda_q"),
        F.expr(
            "CAST(__num * 1000000 AS DECIMAL(38,0))"
            " DIV CAST(__den * __tr AS DECIMAL(38,0))"
        )
        .cast("bigint")
        .alias("explained_share_micro"),
        F.col("__top.j").cast("int").alias("top_axis"),
    )


def centroid_drift(
    emb: DataFrame,
    in_a: F.Column,
    in_b: F.Column,
    vec_col: str = "embedding",
) -> DataFrame:
    """Centroid drift between two embedding cohorts (model versions,
    time slices, label splits): the cosine between the two MEAN
    vectors plus their norm ratio — the two numbers that catch an
    encoder swap or feature-pipeline drift before any ANN index
    degrades (direction rotates → cosine drops; scale changes → norm
    ratio leaves 1).  Complements ``embedding_gram``'s second-moment
    view with the first-moment one.

    Exactness: components quantize to 2⁻²⁴ ints (the gram_matrix
    convention); per-cohort component sums S_j and squared-sum norms
    accumulate EXACTLY in one (cohort, position) aggregate; the final
    cosine/ratio form from those exact decimals in a fixed IEEE op
    order (cast, multiply-sum already exact, one sqrt each) — floored
    micro, engine-replayable.

    Plan: one posexplode projection (narrow, 64× row fan-out of a
    vector column the scan already reads) + ONE map-side-combined
    128-key aggregate + a 64-row self-join on position; the corpus
    never shuffles.  Output one row: ``(n_a, n_b, cos_micro,
    norm_ratio_micro)`` — NULL when either cohort is empty or
    zero-vector.
    """
    d38 = "decimal(38,0)"
    scale = float(1 << _SCALE_BITS)
    base = emb.select(
        in_a.cast("int").alias("__a"),
        in_b.cast("int").alias("__b"),
        F.posexplode(F.col(vec_col)).alias("__p", "__x"),
    ).where((F.col("__a") == 1) | (F.col("__b") == 1))
    q = F.floor(F.col("__x").cast("double") * F.lit(scale)).cast(d38)
    per = base.groupBy("__p").agg(
        F.sum(F.when(F.col("__a") == 1, q).otherwise(F.lit(0).cast(d38)))
        .alias("__sa"),
        F.sum(F.when(F.col("__b") == 1, q).otherwise(F.lit(0).cast(d38)))
        .alias("__sb"),
    )
    counts = emb.agg(
        F.sum(in_a.cast("int")).cast("bigint").alias("n_a"),
        F.sum(in_b.cast("int")).cast("bigint").alias("n_b"),
    )
    moments = per.agg(
        F.sum(F.col("__sa") * F.col("__sb")).cast(d38).alias("__dot"),
        F.sum(F.col("__sa") * F.col("__sa")).cast(d38).alias("__na2"),
        F.sum(F.col("__sb") * F.col("__sb")).cast(d38).alias("__nb2"),
    )
    j = counts.crossJoin(F.broadcast(moments))
    ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("__na2") > 0)
        & (F.col("__nb2") > 0)
    )
    cos = F.col("__dot").cast("double") / (
        F.sqrt(F.col("__na2").cast("double"))
        * F.sqrt(F.col("__nb2").cast("double"))
    )
    ratio = (
        F.sqrt(F.col("__na2").cast("double")) * F.col("n_b").cast("double")
    ) / (
        F.sqrt(F.col("__nb2").cast("double")) * F.col("n_a").cast("double")
    )
    return j.select(
        "n_a",
        "n_b",
        F.when(ok, F.floor(cos * F.lit(1_000_000.0)).cast("bigint")).alias(
            "cos_micro"
        ),
        F.when(ok, F.floor(ratio * F.lit(1_000_000.0)).cast("bigint")).alias(
            "norm_ratio_micro"
        ),
    )
