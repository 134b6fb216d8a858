"""Dedup + similarity operators vs brute-force numpy/python oracles."""

from __future__ import annotations

import itertools

import numpy as np
import pyspark.sql.functions as F

from dane_visual_feature_extraction_worker_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
    simhash_signatures,
)
from dane_visual_feature_extraction_worker_spark.operators.similarity import (
    near_dup_pairs,
    topk_cosine,
)


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (3, "completely different text about spark shuffles here"),
        (4, "short"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingles(text, k=3):
    toks = text.lower().split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_exact_dedup(spark):
    out = {r["rep_id"]: r["n_dupes"] for r in exact_dedup(_docs(spark)).collect()}
    assert out[0] == 2  # docs 0 and 2 identical
    assert out[1] == 1


def test_jaccard_pairs_vs_bruteforce(spark):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(_docs(spark), threshold=0.3).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in _docs(spark).collect()}
    expect = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = _shingles(texts[a]), _shingles(texts[b])
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.3:
            expect[(a, b)] = j
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-5


def test_minhash_candidates_superset_of_high_jaccard(spark):
    """LSH candidates must include exact dups and the 0.75-jaccard pair."""
    got = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(_docs(spark)).collect()}
    assert (0, 2) in got  # identical docs always collide on every band
    assert (0, 1) in got or (1, 2) in got  # high-jaccard likely collides


def test_simhash_identical_docs_same_signature(spark):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(_docs(spark)).collect()}
    assert sigs[0] == sigs[2]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_pairs(_docs(spark), max_hamming=60).collect()}
    assert pairs[(0, 2)] == 0


def test_topk_cosine_vs_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    q = df.where(F.col("vec_id") == 3).select(F.col("embedding").alias("qe"))
    got = [r["vec_id"] for r in topk_cosine(df, q, k=5).collect()]
    v = vecs.astype(np.float64)
    cos = (v @ v[3]) / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[3]))
    expect = list(np.argsort(-cos)[:5])
    assert got == expect


def test_near_dup_pairs_within_bucket(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=16).astype(np.float32)
    # keep the LSH dims (first 8) clear of zero so the tiny perturbation
    # cannot flip a bucket bit
    base[:8] = np.sign(base[:8]) * (np.abs(base[:8]) + 0.5)
    vecs = [base, base + 0.01 * rng.normal(size=16).astype(np.float32), -base]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {(r["vec_a"], r["vec_b"]) for r in near_dup_pairs(df, threshold=0.9).collect()}
    assert (0, 1) in got  # near-identical, same sign bucket
    assert (0, 2) not in got  # opposite bucket, excluded by LSH


def test_simhash_recall_exact_at_mid_hamming(spark):
    """Recall contract (VERDICT r1): banding with max_hamming+1 chunks
    must find EVERY pair with Hamming <= max_hamming — including
    distances 4..8, which the old 4x15-bit banding silently missed.
    Brute-force the signatures, compare pair sets."""
    import itertools

    import numpy as np

    # corpus of small perturbations -> many pairs across Hamming 0..20
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    rng = np.random.default_rng(11)
    docs = []
    for i in range(40):
        toks = list(base)
        for _ in range(int(rng.integers(0, 4))):
            toks[int(rng.integers(len(toks)))] = f"w{int(rng.integers(60))}"
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        simhash_signature_words,
    )

    sigs = {
        r["doc_id"]: (r["sig0"], r["sig1"])
        for r in simhash_signature_words(df, bits=120).collect()
    }

    def _ham(a, b):
        return bin(sigs[a][0] ^ sigs[b][0]).count("1") + bin(
            sigs[a][1] ^ sigs[b][1]
        ).count("1")

    for mh in (4, 8):
        expect = {
            (a, b): _ham(a, b)
            for a, b in itertools.combinations(sorted(sigs), 2)
            if _ham(a, b) <= mh
        }
        got = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_pairs(df, max_hamming=mh).collect()
        }
        assert got == expect, f"max_hamming={mh}: {len(got)} vs {len(expect)}"
    # sanity: the corpus actually exercises the 4..8 range
    dists = [_ham(a, b) for a, b in itertools.combinations(sorted(sigs), 2)]
    assert any(4 <= d <= 8 for d in dists)


def test_simhash_band_keys_wide_enough_for_corpus_scale():
    """VERDICT r2 scale contract: at the default (bits=120, max_hamming
    =8), every band key must be >= 12 bits wide — 4k+ buckets per band,
    so the per-band self-join stays bounded at 10^9 docs (60-bit sigs
    gave 6-7-bit keys -> quadratic)."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        simhash_band_widths,
    )

    widths = simhash_band_widths(120, 8)
    assert len(widths) == 9 and sum(widths) == 120
    assert min(widths) >= 12


def test_simhash_two_word_signatures_match_python_reference(spark):
    """Bit-exact check of the packed-counter signature against a plain
    Python majority-vote reference (both md5 words, empties dropped)."""
    import hashlib

    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        simhash_signature_words,
    )

    rows = [(0, "the quick brown fox"), (1, "pack my box with five dozen jugs"),
            (2, "  spaced   out   tokens  "), (3, "single")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["sig0"], r["sig1"])
        for r in simhash_signature_words(df, bits=120).collect()
    }
    for doc_id, text in rows:
        toks = [t for t in text.lower().split() if t != ""]
        words = [0, 0]
        for w in range(2):
            for b in range(60):
                ones = 0
                for t in toks:
                    hx = hashlib.md5(t.encode()).hexdigest()[15 * w : 15 * w + 15]
                    if (int(hx, 16) >> b) & 1:
                        ones += 1
                if 2 * ones > len(toks):
                    words[w] |= 1 << b
        assert got[doc_id] == tuple(words), doc_id


def test_jaccard_hot_shingle_cap_bounds_candidates(spark):
    """df-cap (VERDICT r1): a stop-shingle present in every doc must not
    feed the candidate self-join, and exact Jaccard values must still be
    computed over the FULL shingle sets of surviving candidates."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        shingle_table,
    )

    # every doc contains the hot prefix; docs 0/1 are real near-dups
    hot = "the quick brown"
    docs = [(0, hot + " fox jumps over the lazy dog tonight"),
            (1, hot + " fox jumps over the lazy dog today"),
            (2, hot + " completely different words entirely here now"),
            (3, hot + " unrelated content about spark window plans yes")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(df, threshold=0.3, max_df=3).collect()
    }
    # pair (0,1): shares many non-hot shingles -> candidate; its jaccard
    # counts ALL common shingles incl. the hot ones (exact value)
    sh = shingle_table(df).toPandas()
    sets = sh.groupby("doc_id")["shingle"].apply(set)
    expect_01 = len(sets[0] & sets[1]) / len(sets[0] | sets[1])
    assert (0, 1) in got
    assert abs(got[(0, 1)] - expect_01) < 1e-5
    # pairs sharing ONLY hot shingles are not candidates (and are below
    # threshold anyway)
    assert (2, 3) not in got


def test_ivf_full_probe_equals_bruteforce(spark):
    """IVF with nprobe == n_centroids scans everything: its top-k must
    equal the brute-force scan exactly (index loses nothing when every
    bucket is probed)."""
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        ivf_topk,
    )

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(80, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    q = df.where(F.col("vec_id") == 7).select(F.col("embedding").alias("qe"))
    brute = [r["vec_id"] for r in topk_cosine(df, q, k=5).collect()]
    full = [
        r["vec_id"]
        for r in ivf_topk(df, q, k=5, n_centroids=8, nprobe=8).collect()
    ]
    assert full == brute
    # nprobe=1 is a subset of the corpus -> results come from one bucket
    one = ivf_topk(df, q, k=5, n_centroids=8, nprobe=1).collect()
    assert len({r["cid"] for r in one}) == 1


def test_lsh_bucket_bigint_no_overflow_at_wide_bits(spark):
    """VERDICT r2: lsh_bits_for can return ~30 bits at corpus scale;
    the bucket accumulator must be int64 (r2's int32 cast overflowed
    past n_bits=31). Check n_bits=40 against a Python fold reference
    and that values exceed int32 range when high bits are set."""
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        hyperplane_signs,
        lsh_bucket,
    )

    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(20, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    n_bits = 40
    got = {
        r["vec_id"]: r["bucket"]
        for r in df.select(
            "vec_id", lsh_bucket("embedding", n_bits, dim=16).alias("bucket")
        ).collect()
    }
    signs = hyperplane_signs(n_bits, 16)
    for i, v in enumerate(vecs):
        b = 0
        for j in range(n_bits):
            acc = 0.0
            for x, s in zip(v, signs[j]):
                acc += float(x) * float(s)
            if acc > 0:
                b |= 1 << j
        assert got[i] == b, i
    assert max(got.values()) > 2**31  # high bits genuinely exercised


def test_lsh_bucket_rejects_unsafe_bit_width(spark):
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        lsh_bucket,
    )
    import pytest

    with pytest.raises(ValueError):
        lsh_bucket("embedding", n_bits=63)


def test_ann_defaults_nbits_from_corpus_size(spark):
    """n_bits=None sizes buckets from lsh_bits_for(count) — green on a
    10x-duplicated corpus, and results match an explicitly-pinned run
    at the same width."""
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        ann_topk,
        lsh_bits_for,
        near_dup_pairs,
    )
    import pyspark.sql.functions as F

    rng = np.random.default_rng(17)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    base = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    # 10x the corpus with distinct ids (same vectors - buckets collide)
    big = base
    for rep in range(1, 10):
        big = big.union(
            base.select((F.col("vec_id") + 300 * rep).alias("vec_id"), "embedding")
        )
    n = big.count()
    bits = lsh_bits_for(n, target_bucket_rows=64)
    assert bits > 1
    q = base.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    auto = ann_topk(big, q, k=5, n_bits=None, dim=16).collect()
    pinned = ann_topk(big, q, k=5, n_bits=lsh_bits_for(n), dim=16).collect()
    assert [r["vec_id"] for r in auto] == [r["vec_id"] for r in pinned]
    pairs = near_dup_pairs(base, threshold=0.99, n_bits=None, dim=16)
    assert pairs.count() >= 0  # plan executes with corpus-sized bits


def test_ivf_assign_blas_matches_narrow(spark):
    """Scale-path parity: the mapInPandas matmul assigner buckets every
    vector identically to the narrow Catalyst-expression assigner
    (random data — no adversarial near-ties)."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_blas,
        ivf_topk,
    )

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(400, 32)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cents = emb.orderBy("vec_id").limit(12).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    narrow = {r["vec_id"]: r["cid"] for r in ivf_assign(emb, cents).collect()}
    blas = {r["vec_id"]: r["cid"] for r in ivf_assign_blas(emb, cents).collect()}
    assert narrow == blas

    q = emb.where("vec_id = 7").select(F.col("embedding").alias("qe"))
    a = ivf_topk(emb, q, k=5, n_centroids=12, nprobe=2).collect()
    b = ivf_topk(
        emb, q, k=5, n_centroids=12, nprobe=2, assign_strategy="blas"
    ).collect()
    assert [(r["vec_id"], r["cos"]) for r in a] == [
        (r["vec_id"], r["cos"]) for r in b
    ]


def test_ann_wide_bits_at_10x_scale(spark):
    """VERDICT r2 done-criterion: ann_lsh green on a 10x-scale corpus
    where lsh_bits_for yields n_bits > 8 (exercises the bigint bucket
    id beyond the old int32-safe range)."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        ann_topk,
        lsh_bits_for,
    )

    n = 40_000
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda j: (
                (F.pmod(F.xxhash64(F.col("id"), j), F.lit(2000)) - 1000)
                / 1000.0
            ).cast("float"),
        ).alias("embedding"),
    )
    bits = lsh_bits_for(n, target_bucket_rows=64)
    assert bits > 8
    q = emb.where("vec_id = 123").select(F.col("embedding").alias("qe"))
    got = ann_topk(emb, q, k=5, n_bits=bits, dim=16).collect()
    assert len(got) >= 1
    # the query's own vector shares its bucket and tops the ranking
    assert got[0]["vec_id"] == 123


def test_kmeans_refinement_improves_quantization(spark):
    """Lloyd refinement must reduce quantization error (mean cosine
    distance to the assigned centroid) vs the raw id-seeded codebook,
    and ivf_topk(refine_iters=2) still returns sane neighbors."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        ivf_assign_blas,
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(31)
    # 4 well-separated gaussian blobs
    centers = rng.normal(size=(4, 16)) * 5
    vecs = np.vstack(
        [c + rng.normal(size=(100, 16)) * 0.3 for c in centers]
    ).astype(np.float32)
    order = rng.permutation(len(vecs))
    emb = spark.createDataFrame(
        [(int(i), vecs[j].tolist()) for i, j in enumerate(order)],
        "vec_id long, embedding array<float>",
    )

    def quant_err(cents_df):
        assigned = ivf_assign_blas(emb, cents_df)
        cmap = {
            r["cid"]: np.asarray(r["cvec"], dtype=np.float64)
            for r in cents_df.collect()
        }
        rows = assigned.collect()
        errs = []
        for r in rows:
            v = np.asarray(r["embedding"], dtype=np.float64)
            c = cmap[r["cid"]]
            errs.append(
                1.0
                - float(v @ c)
                / (np.linalg.norm(v) * np.linalg.norm(c))
            )
        return float(np.mean(errs))

    seed = emb.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    refined = kmeans_centroids(
        emb, n_centroids=4, iters=2, dim=16, assign_strategy="blas"
    )
    assert quant_err(refined) < quant_err(seed)

    q = emb.where("vec_id = 0").select(F.col("embedding").alias("qe"))
    got = ivf_topk(
        emb, q, k=5, n_centroids=4, nprobe=1,
        assign_strategy="blas", refine_iters=2, dim=16,
    ).collect()
    assert got[0]["vec_id"] == 0  # the query vector tops its own bucket
    assert len(got) == 5


def test_contamination_check_vs_bruteforce(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        contamination_check,
    )

    corpus = _docs(spark)
    probe = corpus.where("doc_id = 1")  # near-dup of 0, exact text of 1
    got = {
        r["doc_id"]: r
        for r in contamination_check(
            corpus, probe, k=3, min_overlap=2
        ).collect()
    }
    probe_sh = _shingles("the quick brown fox jumps over the lazy cat")
    for doc_id, text in [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely different text about spark shuffles here"),
        (4, "short"),
        (5, ""),
    ]:
        inter = len(_shingles(text) & probe_sh)
        assert got[doc_id]["n_overlap"] == inter, (doc_id, inter)
        assert got[doc_id]["contaminated"] == (inter >= 2)


def test_connected_components_vs_python(spark):
    """Chains (worst-case diameter), merged components, singletons."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        # chain 1-2-3-4-5, triangle 10-11-12 bridged to 13, pair 20-21
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12),
         (12, 13), (20, 21)],
        "doc_a long, doc_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 13, 20, 21, 99]],
        "doc_id long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, nodes).collect()
    }
    exp = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 13: 10,
           20: 20, 21: 20, 99: 99}
    assert got == exp


def test_label_centroids_exact_mean(spark):
    """Quantized centroid equals the floor-truncated true mean on
    values exactly representable on the 2^-24 grid, per component."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        label_centroids,
    )

    rows = [
        (1, 0, [1.0, -0.5]),
        (2, 0, [0.5, 0.25]),
        (3, 1, [2.0, 4.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = {
        (r["label"], r["pos"]): r
        for r in label_centroids(emb).collect()
    }
    assert out[(0, 0)]["centroid"] == 0.75
    assert out[(0, 1)]["centroid"] == -0.125
    assert out[(0, 0)]["n_vecs"] == 2
    assert out[(1, 0)]["centroid"] == 2.0
    assert out[(1, 1)]["centroid"] == 4.0


def test_label_centroids_plan_one_shuffle(spark):
    """One hash exchange, map-side partial aggregation, no Python."""
    import re

    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        label_centroids,
    )

    emb = spark.range(100).select(
        (F.col("id") % 5).cast("int").alias("label"),
        F.array(*[F.rand(seed=i).cast("float") for i in range(8)]).alias(
            "embedding"
        ),
    )
    plan = label_centroids(emb)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_near_dup_probe_matches_full_corpus_run(spark, tmp_path):
    """Incremental probe == full-corpus LSH pairs restricted to pairs
    touching the delta, with the doc_b_is_new flag correct."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        near_dup_index_build,
        near_dup_probe,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "an unrelated sentence about catalyst plan pruning"),
        (10, "the quick brown fox jumps over the lazy dog"),  # new, dups 0/1
        (11, "an unrelated sentence about catalyst plan pruning"),  # new, dups 2
        (12, "the quick brown fox jumps over the lazy dog today"),  # new near-dup
        (13, "nothing shares any shingle with me whatsoever friends"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = docs.where(F.col("doc_id") < 10)
    new = docs.where(F.col("doc_id") >= 10)
    idx = str(tmp_path / "ndidx")
    near_dup_index_build(old, idx)
    got = {
        (r["doc_a"], r["doc_b"], r["doc_b_is_new"])
        for r in near_dup_probe(new, idx).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs).collect()
    }
    want = {
        (a, b, b >= 10) for (a, b) in full if a >= 10 or b >= 10
    }
    assert got == want
    assert any(a < 10 and bn for (a, _b, bn) in got)  # old x new present
    assert all(not (a < 10 and _b < 10) for (a, _b, _bn) in got)


def test_near_dup_probe_bucketed_index_no_corpus_exchange(spark, tmp_path):
    """Bucketed index probe: (1) result identical to the parquet-path
    probe; (2) the plan scans the index Bucketed with NO exchange on
    the corpus side — only the delta's bands shuffle (O(delta) probe
    cost, the production claim in near_dup_index_build_bucketed)."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        near_dup_index_build,
        near_dup_index_build_bucketed,
        near_dup_probe,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "an unrelated sentence about catalyst plan pruning"),
        (10, "the quick brown fox jumps over the lazy dog"),
        (11, "an unrelated sentence about catalyst plan pruning"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = docs.where(F.col("doc_id") < 10)
    new = docs.where(F.col("doc_id") >= 10)
    idx = str(tmp_path / "ndidx")
    near_dup_index_build(old, idx)
    near_dup_index_build_bucketed(old, "nd_band_idx", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        got_b = near_dup_probe(new, index_table="nd_band_idx")
        plan = got_b._jdf.queryExecution().executedPlan().toString()
        # the index scan is bucket-partitioned: no Exchange may sit
        # between the FileScan of nd_band_idx and its join
        assert "Bucketed: true" in plan, plan
        import re

        scan_block = plan[plan.index("nd_band_idx") - 4000 : plan.index("nd_band_idx")]
        assert not re.search(r"Exchange hashpartitioning\(band", scan_block), plan
        assert {tuple(r) for r in got_b.collect()} == {
            tuple(r) for r in near_dup_probe(new, idx).collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS nd_band_idx")


def test_shared_passage_pairs_locality_and_max_df(spark):
    """(1) a >= w+k-1 token passage shared by two otherwise-different
    docs is detected; (2) disjoint docs never pair; (3) max_df prunes
    corpus-wide boilerplate fingerprints before the self-join."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        shared_passage_pairs,
    )

    passage = "alpha bravo charlie delta echo foxtrot"  # 6 = w+k-1 tokens
    boiler = "terms of service apply to everyone always"
    rows = [
        (0, f"one unique opening sentence here {passage} trailing words x"),
        (1, f"completely different framing text {passage} other ending y"),
        (2, "no overlap with anything else at all in this document"),
    ] + [(10 + i, boiler) for i in range(6)]  # identical ⇒ every
    # boiler fingerprint has document frequency exactly 6
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in shared_passage_pairs(docs, k=3, w=4, min_shared=1).collect()
    }
    assert (0, 1) in got  # the guarantee
    assert not any(2 in p for p in got)
    # boilerplate links all six docs 10..15 without max_df...
    assert any(a >= 10 and b >= 10 for (a, b) in got)
    # ...and max_df=5 (passage in 6 docs) prunes every boilerplate pair
    pruned = {
        (r["doc_a"], r["doc_b"])
        for r in shared_passage_pairs(
            docs, k=3, w=4, min_shared=1, max_df=5
        ).collect()
    }
    assert (0, 1) in pruned
    assert not any(a >= 10 and b >= 10 for (a, b) in pruned)


def test_pq_codes_and_adc_vs_numpy(spark):
    """PQ assignment == numpy argmin per subspace; ADC top-k == numpy
    lookup-table scan; the ADC plan is shuffle-free."""
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        pq_adc_topk,
        pq_codes,
    )

    rng = np.random.default_rng(11)
    dim, m, k, sub = 64, 4, 16, 16
    vecs = rng.normal(size=(80, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cb = vecs[:k].astype(np.float64)  # seeds = 16 smallest vec_ids
    v64 = vecs.astype(np.float64)
    want = {}
    for s in range(m):
        d = ((v64[:, None, s * sub : (s + 1) * sub]
              - cb[None, :, s * sub : (s + 1) * sub]) ** 2).sum(axis=2)
        for i, c in enumerate(np.argmin(d, axis=1)):
            want[(i, s)] = int(c)
    got = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in pq_codes(emb, m=m, n_centroids=k, dim=dim).collect()
    }
    assert got == want

    q = v64[0]
    lut = np.stack(
        [
            ((q[s * sub : (s + 1) * sub] - cb[:, s * sub : (s + 1) * sub]) ** 2
             ).sum(axis=1)
            for s in range(m)
        ]
    )
    adc = np.array(
        [sum(lut[s, want[(i, s)]] for s in range(m)) for i in range(80)]
    )
    want_top = sorted(range(80), key=lambda i: (adc[i], i))[:5]
    out = pq_adc_topk(emb, [float(x) for x in q], k=5, m=m,
                      n_centroids=k, dim=dim)
    rows = out.collect()
    assert [r["vec_id"] for r in rows] == want_top
    for r in rows:
        assert abs(r["adc_dist"] - adc[r["vec_id"]]) < 2e-6
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_pq_recall_report_vs_numpy(spark):
    """Recall@k fields match a numpy exact-vs-ADC reference."""
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        pq_recall_report,
    )

    rng = np.random.default_rng(23)
    dim, m, k, sub, n = 64, 4, 16, 16, 60
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    v64 = vecs.astype(np.float64)
    cb = v64[:k]
    codes = np.stack(
        [
            np.argmin(
                ((v64[:, None, s * sub : (s + 1) * sub]
                  - cb[None, :, s * sub : (s + 1) * sub]) ** 2).sum(axis=2),
                axis=1,
            )
            for s in range(m)
        ],
        axis=1,
    )
    got = {
        r["qid"]: (r["n_exact"], r["n_approx"], r["n_hits"], r["recall"])
        for r in pq_recall_report(emb, qids=(0, 1), k=5).collect()
    }
    for qid in (0, 1):
        q = v64[qid]
        exact = ((v64 - q) ** 2).sum(axis=1)
        ex_top = set(sorted(range(n), key=lambda i: (exact[i], i))[:5])
        lut = np.stack(
            [((q[s * sub : (s + 1) * sub] - cb[:, s * sub : (s + 1) * sub])
              ** 2).sum(axis=1) for s in range(m)]
        )
        adc = np.array(
            [sum(lut[s, codes[i, s]] for s in range(m)) for i in range(n)]
        )
        ap_top = set(sorted(range(n), key=lambda i: (adc[i], i))[:5])
        hits = len(ex_top & ap_top)
        assert got[qid] == (5, 5, hits, (hits * 1000000 // 5) / 1e6)


def test_pq_and_band_config_validation(spark):
    """Config holes raise instead of silently degrading: ragged PQ
    subspaces, wrong query dim, non-divisible LSH banding."""
    import pytest

    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        minhash_bands,
        shingle_table,
    )
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        pq_adc_topk,
        pq_codes,
    )

    emb = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_codes(emb, m=5, n_centroids=4, dim=64)
    with pytest.raises(ValueError, match="query has"):
        pq_adc_topk(emb, [0.0] * 8, n_centroids=4)
    sh = shingle_table(_docs(spark))
    with pytest.raises(ValueError, match="not divisible"):
        minhash_bands(sh, n_hashes=8, band_size=3)


# ------------------------------------------------- containment_pairs


def test_containment_subset_detected_where_jaccard_misses(spark):
    """A short doc embedded verbatim in a long one: containment from
    the short side ~1.0, Jaccard well under 0.5."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, short), (2, short + " " + filler), (3, filler)],
        "doc_id int, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): (r["cont_a_micro"], r["cont_b_micro"])
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    assert (1, 2) in pairs
    ca, cb = pairs[(1, 2)]
    assert ca == 1_000_000  # every shingle of doc 1 is in doc 2
    assert cb < 800_000
    # jaccard at 0.5 misses the same pair
    jp = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) not in jp
    # (2, 3): doc 3 fully contained in doc 2 as well
    assert (2, 3) in pairs and pairs[(2, 3)][1] == 1_000_000


def test_containment_brute_force(spark):
    import random as rnd

    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        containment_pairs,
    )

    rnd.seed(13)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(3, 15))))
        for i in range(12)
    ]

    def shingles(t):
        toks = t.lower().split()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    expect = {}
    for a, ta in rows:
        for b, tb in rows:
            if a >= b:
                continue
            sa, sb = shingles(ta), shingles(tb)
            inter = len(sa & sb)
            if not inter:
                continue
            ca = inter * 1_000_000 // len(sa)
            cb = inter * 1_000_000 // len(sb)
            if max(ca, cb) >= 500_000:
                expect[(a, b)] = (ca, cb)
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["cont_a_micro"], r["cont_b_micro"])
        for r in containment_pairs(docs, threshold=0.5).collect()
    }
    assert got == expect


def test_containment_threshold_validation(spark):
    import pytest as _pt

    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        containment_pairs,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with _pt.raises(ValueError):
        containment_pairs(docs, threshold=0.0)
