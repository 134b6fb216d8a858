"""Property tests (hypothesis): operators vs brute-force references on
small random tables (SURVEY.md §5 item 5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from dane_visual_feature_extraction_worker_spark.operators.asof import (
    asof_join_rangejoin,
    asof_join_sorted,
    asof_join_union,
)
from dane_visual_feature_extraction_worker_spark.operators.sessionize import sessionize

# small deterministic domains keep Spark jobs fast while still hitting
# ties, duplicates, empty-side and single-row corners
_entities = st.sampled_from(["e1", "e2", "e3"])
_ts = st.integers(min_value=0, max_value=50)


def _brute_asof(left: pd.DataFrame, right: pd.DataFrame) -> list:
    out = []
    for _, l in left.iterrows():
        cand = right[(right["k"] == l["k"]) & (right["t"] <= l["t"])]
        if cand.empty:
            out.append((l["k"], l["t"], None, None))
        else:
            best = cand.sort_values(["t", "o"]).iloc[-1]
            out.append((l["k"], l["t"], best["t"], best["o"]))
    return sorted(out, key=lambda x: (x[0], x[1], str(x[2]), str(x[3])))


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(st.tuples(_entities, _ts), min_size=1, max_size=12),
    right=st.lists(st.tuples(_entities, _ts, st.integers(0, 5)), max_size=15),
)
def test_asof_all_paths_match_bruteforce_random(spark, left, right):
    lpd = pd.DataFrame(left, columns=["k", "t"]).drop_duplicates()
    rpd = pd.DataFrame(right, columns=["k", "t", "o"]).drop_duplicates()
    ldf = spark.createDataFrame(lpd, "k string, t long").select(
        "k", F.timestamp_seconds("t").alias("t")
    )
    if len(rpd):
        rdf = spark.createDataFrame(rpd, "k string, t long, o int").select(
            "k", F.timestamp_seconds("t").alias("t"), "o"
        )
    else:
        rdf = spark.createDataFrame([], "k string, t timestamp, o int")

    lpd2 = lpd.copy()
    expect = _brute_asof(lpd2, rpd if len(rpd) else pd.DataFrame(columns=["k", "t", "o"]))

    for fn, kw in (
        (asof_join_union, {}),
        (asof_join_sorted, {"n_buckets": 8}),
        (asof_join_rangejoin, {"left_keys": ["k", "t"]}),
    ):
        got = fn(ldf, rdf, on="k", left_ts="t", right_ts="t", right_order="o", **kw)
        rows = sorted(
            (
                r["k"],
                int(r["t"].timestamp()),
                None if r["matched_ts"] is None else int(r["matched_ts"].timestamp()),
                r["o"],
            )
            for r in got.collect()
        )
        norm = [
            (k, t, m, o)
            for (k, t, m, o) in rows
        ]
        expect_n = [
            (k, int(t), None if m is None else int(m), None if o is None else int(o))
            for (k, t, m, o) in expect
        ]
        assert sorted(norm, key=str) == sorted(expect_n, key=str), fn.__name__


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(st.tuples(_entities, _ts), min_size=1, max_size=20),
    gap=st.integers(min_value=1, max_value=10),
)
def test_sessionize_matches_linear_scan(spark, rows, gap):
    pdf = pd.DataFrame(rows, columns=["k", "t"]).drop_duplicates()
    df = spark.createDataFrame(pdf, "k string, t long").select(
        "k", F.timestamp_seconds("t").alias("ts")
    )
    got = {
        (r["k"], int(r["ts"].timestamp())): r["session_id"]
        for r in sessionize(df, gap_seconds=float(gap), entity="k", ts="ts").collect()
    }
    # O(n) per-entity linear scan reference
    for k, g in pdf.groupby("k"):
        ts_sorted = sorted(g["t"])
        sid = 0
        prev = None
        for t in ts_sorted:
            if prev is not None and t - prev > gap:
                sid += 1
            assert got[(k, t)] == sid, (k, t)
            prev = t


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=30),
        min_size=1,
        max_size=15,
    ),
    max_tokens=st.sampled_from([1, 4, 16]),
)
def test_pack_sequences_invariants_random(spark, texts, max_tokens):
    """Packing invariants on random corpora: per-shard offsets are the
    prefix sums of token counts in doc_id order, spans are consistent,
    and the shard's sequence count covers the last occupied slot."""
    from dane_visual_feature_extraction_worker_spark.operators.packing import (
        pack_sequences,
        shard_summary,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    packed = pack_sequences(docs, max_tokens=max_tokens, n_shards=3)
    rows = packed.collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rs:
            assert r["tok_offset"] == off
            assert r["seq_first"] == off // max_tokens
            assert r["seq_last"] == (off + max(r["n_tokens"], 1) - 1) // max_tokens
            assert r["seq_first"] <= r["seq_last"]
            assert r["pack_offset"] == off % max_tokens
            off += r["n_tokens"]
    summ = {r["shard"]: r for r in shard_summary(packed, max_tokens).collect()}
    for shard, rs in by_shard.items():
        tot = sum(r["n_tokens"] for r in rs)
        assert summ[shard]["n_shard_tokens"] == tot
        assert summ[shard]["n_sequences"] == -(-tot // max_tokens)


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        max_size=12,
    )
)
def test_connected_components_random_graphs(spark, edges):
    """CC labels equal brute-force union-find components on random
    graphs (self-loops dropped, direction normalized)."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        connected_components,
    )

    pairs = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    nodes = list(range(10))
    pdf = (
        spark.createDataFrame(pairs, "doc_a long, doc_b long")
        if pairs
        else spark.createDataFrame([], "doc_a long, doc_b long")
    )
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pdf, ndf).collect()
    }
    # brute force union-find
    parent = list(range(10))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {n: find(n) for n in nodes}
    assert got == exp


def test_minhash_production_config_clusters_planted_dups(spark):
    """Production MinHash config (128 perms / 16 bands of 8): planted
    near-dup groups over a random-ish corpus band-collide and the CC
    pass converges in few rounds (near-cliques have diameter ~1-2; the
    r4 VERDICT asked for the 128/16 config to be validated feeding
    near_dup_clusters, not just the gate's 8/4)."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    # 12 groups x 4 variants: same base text with one word swapped at a
    # varying position -> high Jaccard within group, low across groups.
    # Docs must be long enough that the 128/16 S-curve sits firmly past
    # the within-group similarity: two variants differ at 2 positions,
    # corrupting <= 6 of the word-3-gram shingles, so at 100 words
    # J ~ 92/104 ~ 0.885 -> P(band match) = J^8 ~ 0.37 -> P(pair
    # missed by all 16 bands) ~ 6e-4. (At 30 words J ~ 0.65 and the
    # expected group is DISconnected — not a valid planted test.)
    rows = []
    doc_id = 0
    for g in range(12):
        base = [f"w{g}_{i}" for i in range(100)]
        for v in range(4):
            words = list(base)
            words[(23 * v + g) % 100] = f"swap{g}_{v}"
            rows.append((doc_id, g, " ".join(words)))
            doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, grp int, text string")

    pairs = minhash_lsh_pairs(docs, n_hashes=128, band_size=8)
    nodes = docs.select("doc_id")
    clusters = connected_components(pairs, nodes, max_iters=6)
    joined = clusters.join(docs, "doc_id")
    # every planted group collapses to exactly one cluster id
    per_grp = (
        joined.groupBy("grp")
        .agg(F.countDistinct("cluster_id").alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_grp)
    # and distinct groups never merge
    n_clusters = joined.select("cluster_id").distinct().count()
    assert n_clusters == 12


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=120), min_size=1, max_size=12
    ),
    window=st.integers(min_value=1, max_value=10),
    stride_frac=st.integers(min_value=1, max_value=10),
)
def test_chunk_documents_random_coverage(spark, texts, window, stride_frac):
    """For any window/stride<=window: chunks tile every token index,
    consecutive chunk starts differ by exactly stride, only the last
    chunk may be short, and its window reaches the final token."""
    from dane_visual_feature_extraction_worker_spark.operators.packing import (
        chunk_documents,
    )

    stride = max(1, min(window, stride_frac))
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = chunk_documents(docs, window=window, stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in enumerate(texts):
        n = len([t for t in text.lower().split() if t])
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r["chunk_id"])
        if n == 0:
            assert not chunks
            continue
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        covered = set()
        for i, c in enumerate(chunks):
            assert c["tok_start"] == i * stride
            expect_len = min(window, n - c["tok_start"])
            assert c["n_tokens"] == expect_len
            if i < len(chunks) - 1:
                assert c["n_tokens"] == window  # only the last is short
            covered.update(range(c["tok_start"], c["tok_start"] + c["n_tokens"]))
        assert covered == set(range(n))
        # minimality: the penultimate chunk does NOT reach the end
        if len(chunks) > 1:
            prev = chunks[-2]
            assert prev["tok_start"] + window < n


@settings(max_examples=8, deadline=None)
@given(
    n_rows=st.integers(min_value=1, max_value=200),
    n_shards=st.integers(min_value=1, max_value=9),
    salt=st.sampled_from(["s1", "s2", "s3"]),
)
def test_shuffle_assign_random_permutation(spark, n_rows, n_shards, salt):
    """Any (n_rows, n_shards, salt): output is a bijection onto
    shard-dense positions and shard choice matches the md5 key mod."""
    import hashlib

    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        shuffle_assign,
    )

    docs = spark.createDataFrame([(i,) for i in range(n_rows)], "doc_id long")
    out = shuffle_assign(docs, n_shards=n_shards, salt=salt).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(n_rows))
    by_shard = {}
    for r in out:
        key = int(
            hashlib.md5(f"{salt}|{r['doc_id']}".encode()).hexdigest()[:8], 16
        )
        assert r["shard"] == key % n_shards
        by_shard.setdefault(r["shard"], []).append((r["pos"], key, r["doc_id"]))
    for shard, rows in by_shard.items():
        rows.sort()
        assert [p for p, _, _ in rows] == list(range(1, len(rows) + 1))
        # pos order == (key, doc_id) order
        assert rows == sorted(rows, key=lambda t: (t[1], t[2]))


@settings(max_examples=8, deadline=None)
@given(
    old_rows=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 5), st.integers(0, 5)),
        min_size=0, max_size=25, unique_by=lambda t: t[0],
    ),
    new_rows=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 5), st.integers(0, 5)),
        min_size=0, max_size=25, unique_by=lambda t: t[0],
    ),
)
def test_snapshot_diff_random_vs_dict_reference(spark, old_rows, new_rows):
    from dane_visual_feature_extraction_worker_spark.operators.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame(old_rows, "k long, a long, b long") if old_rows else \
        spark.createDataFrame([], "k long, a long, b long")
    new = spark.createDataFrame(new_rows, "k long, a long, b long") if new_rows else \
        spark.createDataFrame([], "k long, a long, b long")
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, "k").collect()}
    od = {k: (a, b) for k, a, b in old_rows}
    nd = {k: (a, b) for k, a, b in new_rows}
    want = {}
    for k in set(od) | set(nd):
        if k not in od:
            want[k] = "insert"
        elif k not in nd:
            want[k] = "delete"
        elif od[k] != nd[k]:
            want[k] = "update"
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.integers(0, 10_000).map(lambda c: c / 100.0),
        min_size=1, max_size=40,
    ),
    window=st.integers(min_value=1, max_value=8),
)
def test_rolling_median_random_vs_numpy(spark, vals, window):
    import numpy as np
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        rolling_median,
    )

    rows = [(i, 1, i * 5, v) for i, v in enumerate(vals)]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, value double"
    ).select(
        "event_id", "user_id", F.timestamp_seconds("sec").alias("ts"), "value"
    )
    out = sorted(
        rolling_median(e, window_rows=window).collect(),
        key=lambda r: r["event_id"],
    )
    cents = [round(v * 100) for v in vals]
    for i, r in enumerate(out):
        w = cents[max(0, i - window + 1) : i + 1]
        assert r["median_value"] == float(np.median(w)) / 100.0, (i, w)


@settings(max_examples=10, deadline=None)
@given(
    left=st.lists(st.tuples(_entities, _ts), min_size=1, max_size=12),
    right=st.lists(st.tuples(_entities, _ts, st.integers(0, 5)), max_size=15),
)
def test_asof_nearest_forward_match_bruteforce_random(spark, left, right):
    """Random inputs: nearest picks the min-abs-gap candidate with
    backward tie-break; forward picks the min strictly-later candidate
    — each vs a python brute force."""
    from dane_visual_feature_extraction_worker_spark.operators.asof import (
        asof_join_forward,
        asof_join_nearest,
    )

    lpd = pd.DataFrame(left, columns=["k", "t"]).drop_duplicates()
    rpd = pd.DataFrame(right, columns=["k", "t", "o"]).drop_duplicates()
    ldf = spark.createDataFrame(lpd, "k string, t long").select(
        "k", F.timestamp_seconds("t").alias("t")
    )
    if len(rpd):
        rdf = spark.createDataFrame(rpd, "k string, t long, o int").select(
            "k", F.timestamp_seconds("t").alias("t"), "o"
        )
    else:
        rdf = spark.createDataFrame([], "k string, t timestamp, o int")

    def brute(kind):
        out = {}
        for k, t in lpd.itertuples(index=False):
            cands = [
                (rt, ro)
                for rk, rt, ro in rpd.itertuples(index=False)
                if rk == k
            ] if len(rpd) else []
            if kind == "forward":
                fut = [(rt, ro) for rt, ro in cands if rt > t]
                pick = min(fut, key=lambda c: (c[0], c[1])) if fut else None
            else:  # nearest
                if not cands:
                    pick = None
                else:
                    # min by (abs gap, forward-after-backward, side ord rule)
                    def rank(c):
                        rt, ro = c
                        back = rt <= t
                        return (abs(rt - t), 0 if back else 1,
                                -ro if back else ro)
                    pick = min(cands, key=rank)
            out[(k, t)] = pick
        return out

    for kind, fn in (("nearest", asof_join_nearest), ("forward", asof_join_forward)):
        got = {
            (r["k"], int(r["t"].timestamp())): (
                None
                if r["matched_ts"] is None
                else (int(r["matched_ts"].timestamp()), r["o"])
            )
            for r in fn(ldf, rdf, on="k", left_ts="t", right_ts="t",
                        right_order="o").collect()
        }
        want = brute(kind)
        assert got == want, kind


@settings(max_examples=8, deadline=None)
@given(
    left=st.lists(st.tuples(_entities, _ts), min_size=1, max_size=14),
    right=st.lists(st.tuples(_entities, _ts, st.integers(0, 5)), max_size=15),
    block=st.sampled_from([1.0, 7.0, 50.0, 1000.0]),
)
def test_asof_salted_identical_to_plain_random(spark, left, right, block):
    """Any block size (1 s .. one block for everything): the salted
    decomposition returns row-identical results to the plain plan."""
    from dane_visual_feature_extraction_worker_spark.operators.asof import (
        asof_join_salted,
        asof_join_union,
    )

    lpd = pd.DataFrame(left, columns=["k", "t"]).drop_duplicates()
    rpd = pd.DataFrame(right, columns=["k", "t", "o"]).drop_duplicates()
    ldf = spark.createDataFrame(lpd, "k string, t long").select(
        "k", F.timestamp_seconds("t").alias("t")
    )
    if len(rpd):
        rdf = spark.createDataFrame(rpd, "k string, t long, o int").select(
            "k", F.timestamp_seconds("t").alias("t"), "o"
        )
    else:
        rdf = spark.createDataFrame([], "k string, t timestamp, o int")
    plain = sorted(
        map(str, asof_join_union(ldf, rdf, on="k", left_ts="t",
                                 right_ts="t", right_order="o").collect())
    )
    salted = sorted(
        map(str, asof_join_salted(ldf, rdf, on="k", left_ts="t",
                                  right_ts="t", right_order="o",
                                  block_seconds=block).collect())
    )
    assert plain == salted


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12),
        min_size=1,
        max_size=10,
    ),
    span=st.integers(1, 4),
    rate=st.sampled_from([0.0, 0.15, 0.5, 1.0]),
)
def test_span_corrupt_roundtrip_random(spark, docs, span, rate):
    """For ANY corpus / span length / mask rate: splicing the target
    spans back into the input reproduces the original token stream."""
    import re

    from dane_visual_feature_extraction_worker_spark.operators.packing import (
        span_corrupt,
    )

    rows = [(i, " ".join(t)) for i, t in enumerate(docs) if t]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sent = re.compile(r"^<extra_id_(\d+)>$")
    for r in span_corrupt(df, span_tokens=span, mask_rate=rate).collect():
        spans, cur = {}, None
        for tok in r["target_text"].split(" "):
            m = sent.match(tok)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(tok)
        out = []
        for tok in r["input_text"].split(" "):
            m = sent.match(tok)
            out.extend(spans[int(m.group(1))] if m else [tok])
        assert out == docs[r["doc_id"]]


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(0, 100),
            st.floats(-100, 100, allow_nan=False).map(lambda x: round(x, 2)),
        ),
        min_size=1,
        max_size=30,
    ),
    cut=st.integers(0, 100),
)
def test_rollup_merge_equals_recompute_random(spark, rows, cut):
    """merge(partial states over ANY split) is bit-identical to the
    from-scratch aggregation — the algebraic-aggregate identity."""
    from dane_visual_feature_extraction_worker_spark.operators.rollup import (
        merge_rollups,
        rollup_state,
    )

    df = spark.createDataFrame(rows, "k string, t long, value double")
    lo, hi = df.where(F.col("t") <= cut), df.where(F.col("t") > cut)
    merged = {
        r["k"]: (r["n_rows"], r["sum_value"], r["min_value"], r["max_value"])
        for r in merge_rollups(rollup_state(lo, "k"), rollup_state(hi, "k"))
        .collect()
    }
    direct = {
        r["k"]: (r["n_rows"], r["sum_value"], r["min_value"], r["max_value"])
        for r in rollup_state(df, "k").collect()
    }
    assert merged == direct


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6),
        min_size=2,
        max_size=12,
        unique=True,
    )
)
def test_edit1_pairs_complete_vs_bruteforce(spark, keys):
    """The deletion-neighborhood join finds EXACTLY the distance<=1
    pairs a brute-force quadratic scan finds — the recall claim the
    SymSpell construction stands on (substitution/insert/delete all
    meet in the 1-deletion neighborhood)."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        edit1_pairs,
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    docs = spark.createDataFrame(
        list(enumerate(keys)), "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in edit1_pairs(docs, F.col("text"), key_len=6).collect()
    }
    want = {
        (i, j)
        for i in range(len(keys))
        for j in range(i + 1, len(keys))
        if lev(keys[i], keys[j]) <= 1
    }
    assert got == want
