"""Unit tests: behavior_profile (entropy/HHI), session_cooccurrence,
and the closed-form CUSUM drift detector."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _events_df(spark, n=1000, n_users=10):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 11).alias("ts"),
        (F.col("id") % n_users).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias(
            "event_type"
        ),
        ((F.col("id") * 13 % 997) / 100.0).alias("value"),
    )


def test_behavior_profile_matches_direct_formula(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        behavior_profile,
    )

    df = _events_df(spark)
    got = {r["user_id"]: r for r in behavior_profile(df).collect()}
    pd = df.toPandas()
    for uid, g in pd.groupby("user_id"):
        counts = g["event_type"].value_counts()
        n = int(counts.sum())
        # replicate the micro-nat quantization exactly
        slc = sum(int(c) * math.floor(math.log(c) * 1e6) for c in counts)
        ent = (math.floor(math.log(n) * 1e6) - slc // n) / 1e6
        hhi = float(sum(int(c) ** 2 for c in counts)) / float(n * n)
        r = got[uid]
        assert r["n_rows"] == n
        assert r["n_categories"] == len(counts)
        assert math.isclose(r["entropy_nats"], ent, abs_tol=1e-12)
        assert math.isclose(r["hhi"], hhi, rel_tol=1e-12)
    # entropy of a single-category entity is exactly 0
    one = spark.createDataFrame(
        [(1, "only")] * 5, "user_id int, event_type string"
    )
    assert behavior_profile(one).collect()[0]["entropy_nats"] == 0.0


def test_session_cooccurrence_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sessionize import (
        session_cooccurrence,
        sessionize,
    )

    df = _events_df(spark, n=600, n_users=6)
    got = {
        (r["cat_a"], r["cat_b"]): r["n_sessions"]
        for r in session_cooccurrence(
            df,
            gap_seconds=40.0,
            entity="user_id",
            category="event_type",
            order=("ts", "event_id"),
        ).collect()
    }
    sess = sessionize(
        df, 40.0, entity="user_id", order=("ts", "event_id")
    ).toPandas()
    expect: dict[tuple[str, str], int] = {}
    for _, g in sess.groupby(["user_id", "session_id"]):
        cats = sorted(set(g["event_type"]))
        for i in range(len(cats)):
            for j in range(i + 1, len(cats)):
                expect[(cats[i], cats[j])] = (
                    expect.get((cats[i], cats[j]), 0) + 1
                )
    assert got == expect


def test_cusum_matches_recursion_and_flags_shift(spark):
    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        cusum_drift,
    )

    # one entity: baseline 1.00 then a sustained shift to 3.00
    rows = [(i, 1_700_000_000 + i, 0, 1.0 if i < 50 else 3.0) for i in range(80)]
    df = spark.createDataFrame(
        rows, "event_id long, epoch long, user_id long, value double"
    ).select(
        "event_id",
        F.timestamp_seconds("epoch").alias("ts"),
        "user_id",
        "value",
    )
    out = (
        cusum_drift(df, drift_cents=150, threshold_cents=600)
        .orderBy("event_id")
        .collect()
    )
    # brute-force recursion in integer cents
    s, expect = 0, []
    for i in range(80):
        x = 100 if i < 50 else 300
        s = max(0, s + (x - 150))
        expect.append(s)
    for r, e in zip(out, expect):
        assert math.isclose(r["cusum"], e / 100.0, abs_tol=1e-12)
        assert r["is_alarm"] == (e > 600)
    # the baseline stays at 0; the alarm fires during the shift
    assert all(not r["is_alarm"] for r in out[:50])
    assert any(r["is_alarm"] for r in out[50:])


def test_cusum_single_exchange_plan(spark):
    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        cusum_drift,
    )

    plan = (
        cusum_drift(_events_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_new_ops_plan_shapes(spark):
    """Plan audits: the shapes the SURVEY rows claim."""
    from dane_visual_feature_extraction_worker_spark.operators.encoding import (
        robust_outliers,
    )
    from dane_visual_feature_extraction_worker_spark.operators.sessionize import (
        session_cooccurrence,
    )
    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        rolling_distinct,
        rolling_slope,
    )

    e = _events_df(spark)

    # rolling_slope / rolling_distinct: ONE hash exchange (the entity
    # sort), nothing else
    for op in (rolling_slope, rolling_distinct):
        p = _plan(op(e))
        assert p.count("Exchange hashpartitioning") == 1, op.__name__
        assert "BroadcastExchange" not in p, op.__name__

    # robust_outliers: the corpus NEVER hash-shuffles — the quantile
    # scalars come back as broadcasts (median twice: once feeding the
    # deviation aggregate inside the MAD subtree, once in the final
    # flag map; MAD once)
    p = _plan(robust_outliers(e))
    assert p.count("BroadcastExchange") == 3
    assert "Exchange hashpartitioning" not in p

    # session_cooccurrence: no joins at all (the self-join formulation
    # is the plan this operator exists to avoid); the sessionize window
    # exchange + the pair-count exchange
    p = _plan(
        session_cooccurrence(
            e, 40.0, entity="user_id", category="event_type",
            order=("ts", "event_id"),
        )
    )
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 2


def test_null_profile_counts(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        null_profile,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 1.0),
            (2, "", None),
            (None, None, float("nan")),
        ],
        "id long, s string, v double",
    )
    got = {r["column"]: r for r in null_profile(df).collect()}
    assert got["id"]["n_rows"] == 3 and got["id"]["n_null"] == 1
    assert got["id"]["n_empty"] is None and got["id"]["n_nan"] is None
    assert got["s"]["n_null"] == 1 and got["s"]["n_empty"] == 1
    assert got["v"]["n_null"] == 1 and got["v"]["n_nan"] == 1


def test_quantile_normalize_is_cume_dist(spark):
    from dane_visual_feature_extraction_worker_spark.operators.encoding import (
        quantile_normalize,
    )

    df = _events_df(spark, n=500)
    got = dict(
        quantile_normalize(df, keys=("event_id",)).collect()
    )
    pd = df.toPandas()
    cents = (pd["value"] * 100).round().astype("int64")
    n = len(pd)
    for eid, c in zip(pd["event_id"], cents):
        expect = (cents <= c).sum() / n
        assert abs(got[eid] - expect) < 1e-12
    # ties share the same ecdf by construction
    # corpus never shuffles: ECDF table comes back broadcast
    plan = (
        quantile_normalize(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_source_overlap_identical_and_disjoint(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        source_overlap,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "s1"),
            (2, "alpha beta gamma delta", "s2"),  # identical to s1
            (3, "zig zag zoom boom pow", "s3"),  # disjoint
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["g_a"], r["g_b"]): r["jaccard"]
        for r in source_overlap(docs).collect()
    }
    assert out[("s1", "s2")] == 1.0
    assert ("s1", "s3") not in out and ("s3", "s1") not in out


def test_transition_entropy_matches_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        transition_entropy,
    )

    df = _events_df(spark, n=900, n_users=7)
    got = {r["src_state"]: r for r in transition_entropy(df).collect()}

    # brute force: replay the lag chain per user in pandas
    pd = df.toPandas().sort_values(["user_id", "ts", "event_id"])
    pairs: dict[tuple, int] = {}
    for _, g in pd.groupby("user_id"):
        seq = list(g["event_type"])
        for a, b in zip(seq, seq[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    srcs = sorted({a for a, _ in pairs})
    tot_num, tot_n = 0, 0
    exp = {}
    for s in srcs:
        counts = [c for (a, _), c in pairs.items() if a == s]
        n_src = sum(counts)
        num = n_src * math.floor(math.log(n_src) * 1e6) - sum(
            c * math.floor(math.log(c) * 1e6) for c in counts
        )
        exp[s] = (n_src, num // n_src)
        tot_num += num
        tot_n += n_src
    rate = tot_num // tot_n

    assert set(got) == set(srcs)
    for s in srcs:
        assert got[s]["n_src"] == exp[s][0]
        assert got[s]["h_cond_micro"] == exp[s][1]
        assert got[s]["rate_micro"] == rate
        # entropy is nonnegative and bounded by ln(|states|)
        assert 0 <= got[s]["h_cond_micro"] <= math.log(7) * 1e6 + 1


def test_transition_entropy_degenerate_chain_is_zero(spark):
    """A deterministic A->B->A->... loop has zero conditional entropy."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        transition_entropy,
    )

    df = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id")).alias("ts"),
        F.lit(0).alias("user_id"),
        F.when(F.col("id") % 2 == 0, "A").otherwise("B").alias("event_type"),
    )
    rows = transition_entropy(df).collect()
    assert all(r["h_cond_micro"] == 0 for r in rows)
    assert all(r["rate_micro"] == 0 for r in rows)


def test_lorenz_curve_brute_force_and_monotone(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        lorenz_curve,
    )

    df = _events_df(spark, n=1200, n_users=23)
    rows = sorted(
        lorenz_curve(df, entity="user_id").collect(),
        key=lambda r: r["bucket"],
    )
    # brute force in pandas
    counts = (
        df.toPandas().groupby("user_id").size().reset_index(name="n")
    ).sort_values(["n", "user_id"]).reset_index(drop=True)
    k, m = 10, len(counts)
    # ntile: first (m % k) buckets get ceil(m/k), rest floor(m/k)
    sizes = [(m // k) + (1 if i < m % k else 0) for i in range(k)]
    total_e, total_n = m, int(counts["n"].sum())
    pos, cum_e, cum_n = 0, 0, 0
    for i, r in enumerate(rows):
        grp = counts.iloc[pos : pos + sizes[i]]
        pos += sizes[i]
        cum_e += len(grp)
        cum_n += int(grp["n"].sum())
        assert r["n_entities"] == len(grp)
        assert r["n_events"] == int(grp["n"].sum())
        assert r["entity_cum_micro"] == cum_e * 1_000_000 // total_e
        assert r["event_cum_micro"] == cum_n * 1_000_000 // total_n
    # Lorenz curve properties: event share lags entity share, both
    # monotone, both end at exactly 1e6
    ev = [r["event_cum_micro"] for r in rows]
    en = [r["entity_cum_micro"] for r in rows]
    assert ev == sorted(ev) and en == sorted(en)
    assert ev[-1] == en[-1] == 1_000_000
    assert all(e <= a for e, a in zip(ev, en))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        lorenz_curve(df, n_buckets=1)


def test_poisson_bootstrap_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        POISSON1_THRESHOLDS,
        poisson_bootstrap,
    )

    df = _events_df(spark, n=400, n_users=5)
    B = 8
    rows = sorted(
        poisson_bootstrap(
            df, value="value", id_col="event_id", n_replicates=B,
            salt="t",
        ).collect(),
        key=lambda r: r["replicate"],
    )

    import hashlib

    def key(eid, b):
        hx = hashlib.md5(f"t|{eid}#{b}".encode()).hexdigest()
        return int(hx[:8], 16)

    def weight(k):
        for w, t in enumerate(POISSON1_THRESHOLDS):
            if k < t:
                return w
        return 8

    pd = df.toPandas()
    means = {}
    for b in range(B):
        n = s = 0
        for _, r in pd.iterrows():
            w = weight(key(int(r["event_id"]), b))
            cents = int(round(float(r["value"]) * 100))
            n += w
            s += w * cents
        means[b] = (n, s // n)
    srt = sorted(m for _, m in means.values())
    for r in rows:
        assert (r["n_eff"], r["mean_cents"]) == means[r["replicate"]]
        assert r["ci_lo_cents"] == srt[1]
        assert r["ci_hi_cents"] == srt[-2]
    # sanity: the true mean lies inside the bootstrap CI
    true_cents = int(pd["value"].mul(100).round().sum()) // len(pd)
    assert rows[0]["ci_lo_cents"] <= true_cents <= rows[0]["ci_hi_cents"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        poisson_bootstrap(df, n_replicates=1)


def test_mann_whitney_matches_brute_force_ranks(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        mann_whitney_drift,
    )

    df = _events_df(spark, n=500, n_users=9)
    [r] = mann_whitney_drift(df, ts="ts", value="value").collect()

    pd = df.toPandas()
    us = pd["ts"].astype("int64") // 1000  # ns -> us
    cut = (int(us.min()) + int(us.max())) // 2
    cents = (pd["value"] * 100).round().astype("int64")
    g1 = sorted(cents[us <= cut])
    g2 = sorted(cents[us > cut])
    pooled = sorted(cents)
    # textbook average ranks with ties, doubled to stay integral
    from collections import Counter

    cnt = Counter(pooled)
    rank2 = {}
    cum = 0
    for v in sorted(cnt):
        t = cnt[v]
        rank2[v] = 2 * cum + t + 1  # doubled average rank
        cum += t
    r1x2 = sum(rank2[v] for v in g1)
    n1, n2 = len(g1), len(g2)
    u1x2 = r1x2 - n1 * (n1 + 1)
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert r["r1_x2"] == float(r1x2)
    assert r["u1_x2"] == float(u1x2)
    import math

    z = (u1x2 - n1 * n2) / (2.0 * math.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0))
    assert r["z_micro"] == math.floor(z * 1e6)
    # identity check: U1 + U2 = n1*n2 (doubled: u1x2 + u2x2 = 2*n1*n2)
    r2x2 = sum(rank2[v] for v in g2)
    u2x2 = r2x2 - n2 * (n2 + 1)
    assert u1x2 + u2x2 == 2 * n1 * n2


def test_spearman_matches_brute_force_and_monotone(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        spearman_corr,
    )

    df = _events_df(spark, n=300, n_users=6).select(
        (F.col("value") * 100).cast("bigint").alias("x"),
        ((F.col("event_id") * 7) % 50).cast("bigint").alias("y"),
    )
    [r] = spearman_corr(df, x="x", y="y").collect()

    pd = df.toPandas()

    def rank2(vals):
        from collections import Counter

        cnt = Counter(vals)
        out, cum = {}, 0
        for v in sorted(cnt):
            out[v] = 2 * cum + cnt[v] + 1
            cum += cnt[v]
        return [out[v] for v in vals]

    a = rank2(list(pd["x"]))
    b = rank2(list(pd["y"]))
    n = len(a)
    sx, sy = sum(a), sum(b)
    sxy = sum(p * q for p, q in zip(a, b))
    sxx, syy = sum(p * p for p in a), sum(q * q for q in b)
    import math

    rho = (n * sxy - sx * sy) / math.sqrt(
        float(n * sxx - sx * sx) * float(n * syy - sy * sy)
    )
    assert r["n"] == n
    assert r["rho"] == math.floor(rho * 1e6) / 1e6

    # perfectly monotone pair -> rho == 1 exactly (ranks identical)
    mono = spark.range(100).select(
        F.col("id").alias("x"), (F.col("id") * 3 + 7).alias("y")
    )
    [m] = spearman_corr(mono, x="x", y="y").collect()
    assert m["rho"] == 1.0


def test_cohen_kappa_textbook_cases(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        cohen_kappa,
    )

    # textbook 2x2: a=20, b=5, c=10, d=15 -> kappa = (N*35 - pe)/(N^2 - pe)
    rows = (
        [(True, True)] * 20
        + [(True, False)] * 5
        + [(False, True)] * 10
        + [(False, False)] * 15
    )
    df = spark.createDataFrame(rows, "ra boolean, rb boolean")
    [r] = cohen_kappa(df, F.col("ra"), F.col("rb")).collect()
    N, agree = 50, 35
    pe = (25 * 30) + (25 * 20)  # (a+b)(a+c) + (c+d)(b+d)
    import math

    expect = math.floor((N * agree - pe) / (N * N - pe) * 1e6) / 1e6
    assert (r["n"], r["n_agree"]) == (N, agree)
    assert r["kappa"] == expect

    # perfect agreement -> kappa == 1; constant raters -> NULL
    perf = spark.createDataFrame(
        [(True, True)] * 3 + [(False, False)] * 4, "ra boolean, rb boolean"
    )
    assert cohen_kappa(perf, F.col("ra"), F.col("rb")).collect()[0][
        "kappa"
    ] == 1.0
    const = spark.createDataFrame(
        [(True, True)] * 5, "ra boolean, rb boolean"
    )
    assert (
        cohen_kappa(const, F.col("ra"), F.col("rb")).collect()[0]["kappa"]
        is None
    )


def test_cuped_reduces_variance_and_preserves_contrast(spark):
    """CUPED invariants: theta from pooled moments, the adjusted
    per-arm means replay the closed-form y_bar - theta*(x_bar - xbar),
    and the weighted adjusted means recombine to the pooled mean."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        cuped_report,
    )

    df = _events_df(spark, n=2000, n_users=40)
    rows = {r["arm"]: r for r in cuped_report(df).collect()}
    assert set(rows) == {"a", "b"}

    # brute force in pandas with the same md5 split
    import hashlib
    import math

    pd = df.toPandas()
    us = pd["ts"].astype("int64") // 1000
    cut = (int(us.min()) + int(us.max())) // 2
    pd["cents"] = (pd["value"] * 100).round().astype("int64")
    pd["pre"] = pd["cents"].where(us <= cut, 0)
    pd["post"] = pd["cents"].where(us > cut, 0)
    per = pd.groupby("user_id")[["pre", "post"]].sum()
    arm = {
        u: int(hashlib.md5(f"ab|{u}".encode()).hexdigest()[:8], 16) % 2
        for u in per.index
    }
    xs = per["pre"].astype(int)
    ys = per["post"].astype(int)
    n = len(per)
    sx, sy = int(xs.sum()), int(ys.sum())
    sxx = int((xs * xs).sum())
    sxy = int((xs * ys).sum())
    cov, vx = n * sxy - sx * sy, n * sxx - sx * sx
    theta = cov / vx
    xbar = sx / n
    for tag, sel in (("a", 0), ("b", 1)):
        mask = [arm[u] == sel for u in per.index]
        na = sum(mask)
        mean_y = int(ys[mask].sum()) / na
        mean_x = int(xs[mask].sum()) / na
        adj = mean_y - theta * (mean_x - xbar)
        assert rows[tag]["n"] == na
        assert rows[tag]["mean_cents_micro"] == math.floor(mean_y * 1e6)
        assert rows[tag]["mean_adj_micro"] == math.floor(adj * 1e6)
    # recombination identity: sum_g n_g * adj_g == sum_g n_g * mean_g
    tot_adj = sum(
        rows[t]["n"] * rows[t]["mean_adj_micro"] for t in "ab"
    )
    tot_raw = sum(
        rows[t]["n"] * rows[t]["mean_cents_micro"] for t in "ab"
    )
    assert abs(tot_adj - tot_raw) <= n  # floor noise only
    assert 0 <= rows["a"]["rho2_micro"] <= 1_000_000


# ----------------------------- fleiss_kappa / macro_f1 / readability


def _brute_fleiss(assignments):
    """Independent Fleiss computation from (item, category) rows —
    textbook formula over floats."""
    from collections import Counter, defaultdict

    per_item = defaultdict(Counter)
    for i, c in assignments:
        per_item[i][c] += 1
    n = len(per_item)
    ms = {sum(cnt.values()) for cnt in per_item.values()}
    if len(ms) != 1:
        return None
    (m,) = ms
    if m < 2:
        return None
    p_i = [
        (sum(v * v for v in cnt.values()) - m) / (m * (m - 1))
        for cnt in per_item.values()
    ]
    p_bar = sum(p_i) / n
    cat_tot = Counter()
    for cnt in per_item.values():
        cat_tot.update(cnt)
    p_j = [v / (n * m) for v in cat_tot.values()]
    p_e = sum(p * p for p in p_j)
    if 1 - p_e <= 0:
        return None
    return (p_bar - p_e) / (1 - p_e)


def test_fleiss_kappa_brute_force(spark):
    import math
    import random as rnd

    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        fleiss_kappa,
    )

    rnd.seed(11)
    rows = []
    for i in range(40):
        for _ in range(4):  # m = 4 raters
            rows.append((i, rnd.choice("abc")))
    df = spark.createDataFrame(rows, "item_id int, category string")
    [out] = fleiss_kappa(df).collect()
    expect = _brute_fleiss(rows)
    assert out["n_items"] == 40 and out["m_raters"] == 4
    assert abs(out["kappa"] - math.floor(expect * 1e6) / 1e6) < 1e-9


def test_fleiss_kappa_degenerate_and_ragged(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        fleiss_kappa,
    )

    # constant panel: every rater always says 'x' -> P_e = 1 -> NULL
    const = spark.createDataFrame(
        [(i, "x") for i in range(5) for _ in range(3)],
        "item_id int, category string",
    )
    assert fleiss_kappa(const).collect()[0]["kappa"] is None
    # ragged panel: item 0 has 3 ratings, item 1 has 2 -> NULL
    ragged = spark.createDataFrame(
        [(0, "x"), (0, "y"), (0, "x"), (1, "x"), (1, "y")],
        "item_id int, category string",
    )
    assert fleiss_kappa(ragged).collect()[0]["kappa"] is None
    # perfect agreement on a two-category mix -> kappa == 1
    perfect = spark.createDataFrame(
        [(i, "x" if i % 2 else "y") for i in range(6) for _ in range(3)],
        "item_id int, category string",
    )
    assert fleiss_kappa(perfect).collect()[0]["kappa"] == 1.0


def _brute_macro_f1(pairs):
    classes = sorted({t for t, _ in pairs} | {p for _, p in pairs})
    out = {}
    f1s, ps, rs = [], [], []
    for c in classes:
        tp = sum(1 for t, p in pairs if t == c and p == c)
        fp = sum(1 for t, p in pairs if t != c and p == c)
        fn = sum(1 for t, p in pairs if t == c and p != c)
        pm = tp * 1_000_000 // (tp + fp) if tp + fp else 0
        rm = tp * 1_000_000 // (tp + fn) if tp + fn else 0
        fm = 2 * pm * rm // (pm + rm) if pm + rm else 0
        out[c] = (tp, fp, fn, pm, rm, fm)
        ps.append(pm)
        rs.append(rm)
        f1s.append(fm)
    k = len(classes)
    out["__macro__"] = (
        sum(v[0] for c, v in out.items() if c != "__macro__"),
        sum(v[1] for c, v in out.items() if c != "__macro__"),
        sum(v[2] for c, v in out.items() if c != "__macro__"),
        sum(ps) // k,
        sum(rs) // k,
        sum(f1s) // k,
    )
    return out


def test_macro_f1_brute_force(spark):
    import random as rnd

    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        macro_f1,
    )

    rnd.seed(3)
    pairs = [
        (rnd.choice("abcd"), rnd.choice("abc"))  # 'd' never predicted
        for _ in range(300)
    ]
    df = spark.createDataFrame(pairs, "y_true string, y_pred string")
    got = {
        r["class"]: (
            r["tp"], r["fp"], r["fn"],
            r["precision_micro"], r["recall_micro"], r["f1_micro"],
        )
        for r in macro_f1(df).collect()
    }
    assert got == _brute_macro_f1(pairs)
    # never-predicted class scores 0 precision AND 0 f1, dragging macro
    assert got["d"][3] == 0 and got["d"][5] == 0


def test_readability_known_counts(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        readability,
    )

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),  # 6 words, 2 sents, 6 syl
            (2, ""),                            # zero words -> NULL
            (3, None),
            (4, "queueing theory"),             # no sentence punct -> 1
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_sentences"], r["n_syllables"],
            r["flesch_micro"],
        )
        for r in readability(docs).collect()
    }
    assert got[1][:3] == (6, 2, 6)
    # identity replay: 206835000 - 1015*(6e6//2)//1000 - 84600*(6e6//6)//1000
    assert got[1][3] == 206835000 - 1015 * 3_000_000 // 1000 - 84600 * 1_000_000 // 1000
    assert got[2] == (0, 1, 0, None) and got[3] == (0, 1, 0, None)
    # 'queueing' = one run 'ueuei' + 'eo' in theory... brute: vowel runs
    assert got[4][0] == 2 and got[4][1] == 1


def test_readability_brute_force(spark):
    import random as rnd
    import re

    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        readability,
    )

    rnd.seed(5)
    vocab = ["alpha", "bee", "sky", "queue", "strength", "io", "xyz"]
    rows = []
    for i in range(50):
        n = rnd.randint(1, 12)
        words = [rnd.choice(vocab) for _ in range(n)]
        # sprinkle sentence punctuation
        txt = " ".join(
            w + ("." if rnd.random() < 0.2 else "") for w in words
        )
        rows.append((i, txt))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_sentences"], r["n_syllables"])
        for r in readability(df).collect()
    }
    for i, txt in rows:
        low = txt.lower()
        w = len([t for t in re.split(r"\s+", low) if t])
        s = max(len(re.findall(r"[.!?]+", low)), 1)
        syl = len(re.findall(r"[aeiouy]+", low))
        assert got[i] == (w, s, syl), (i, txt)
