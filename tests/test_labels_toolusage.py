"""future_window_label / tool_usage_profile / group_kfold /
bigram_logprob_score: python brute-force cross-checks, leakage-boundary
cases, plan audits (O(n) frames, subset-rule single exchange)."""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest

from dane_visual_feature_extraction_worker_spark.operators.labels import (
    future_window_label,
)
from dane_visual_feature_extraction_worker_spark.operators.sampling import (
    group_kfold,
    sample_key,
)
from dane_visual_feature_extraction_worker_spark.operators.textstats import (
    bigram_logprob_score,
)
from dane_visual_feature_extraction_worker_spark.operators.toolusage import (
    tool_usage_profile,
)

T0 = dt.datetime(2024, 1, 1)
EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, event_type string, "
    "value double"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


# ---------------------------------------------------------------- labels


def test_future_window_label_brute_force(spark):
    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(6):
        t = 0
        for _ in range(rng.randint(1, 40)):
            t += rng.randint(1, 5000)  # seconds; horizon will split these
            typ = rng.choice(["view", "click", "purchase", "error"])
            rows.append((eid, u, T0 + dt.timedelta(seconds=t), typ, 1.0))
            eid += 1
    df = _events(spark, rows)
    out = {
        r["event_id"]: (r["label"], r["tte_micros"])
        for r in future_window_label(
            df, target="purchase", horizon_s=3000, entity="user_id"
        ).collect()
    }
    # brute force: next purchase strictly after in (ts, event_id) order
    by_user: dict[int, list] = {}
    for e, u, ts, typ, _ in rows:
        by_user.setdefault(u, []).append((ts, e, typ))
    for u, evs in by_user.items():
        evs.sort()
        for i, (ts, e, typ) in enumerate(evs):
            nxt = next(
                (t2 for t2, _, ty2 in evs[i + 1 :] if ty2 == "purchase"),
                None,
            )
            if nxt is None:
                assert out[e] == (0, None), e
            else:
                tte = int((nxt - ts).total_seconds() * 1_000_000)
                assert out[e] == (1 if tte <= 3000 * 1_000_000 else 0, tte), e


def test_future_window_label_no_self_label(spark):
    """A purchase with NO later purchase must be label=0: the anchor
    never reads itself (the leakage boundary)."""
    rows = [(0, 1, T0, "purchase", 1.0)]
    out = future_window_label(
        _events(spark, rows), target="purchase", horizon_s=10
    ).collect()[0]
    assert out["label"] == 0 and out["tte_micros"] is None


def test_future_window_label_is_linear_frame(spark):
    """Plan audit: the window frame must be the O(n) running prefix on
    the REVERSED order — no 'unboundedfollowing' anywhere."""
    df = _events(spark, [(0, 1, T0, "view", 1.0)])
    plan = (
        future_window_label(df, target="purchase", horizon_s=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "unboundedfollowing" not in plan.lower(), plan


# ------------------------------------------------------------ tool usage


def test_tool_usage_profile_brute_force(spark):
    rng = random.Random(3)
    rows = []
    for c in range(5):
        for i in range(rng.randint(1, 30)):
            tool = rng.choice([None, None, "pay", "retry", "search"])
            rows.append(
                (str(c), i, "assistant", "", tool, T0 + dt.timedelta(seconds=i))
            )
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["tools_so_far"],
            r["distinct_tools_so_far"],
            r["turns_since_tool"],
        )
        for r in tool_usage_profile(tr).collect()
    }
    by_conv: dict[str, list] = {}
    for c, i, _, _, tool, ts in rows:
        by_conv.setdefault(c, []).append((ts, i, tool))
    for c, evs in by_conv.items():
        evs.sort()
        seen: list = []
        for ts, i, _tool in evs:
            prior = [t for _, j, t in seen if t is not None]
            last_turn = next(
                (j for _, j, t in reversed(seen) if t is not None), None
            )
            exp = (
                len(prior),
                len(set(prior)),
                None if last_turn is None else i - last_turn,
            )
            assert got[(c, i)] == exp, (c, i, exp, got[(c, i)])
            seen.append((ts, i, _tool))


def test_tool_usage_single_exchange(spark):
    """Subset rule: hash(conv_id) must satisfy BOTH window clusterings
    — exactly one exchange in the whole plan."""
    tr = spark.createDataFrame(
        [("a", 0, "u", "", "pay", T0)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    plan = (
        tool_usage_profile(tr)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.lower().count("exchange hashpartitioning") == 1, plan


# -------------------------------------------------------------- kfold


def test_group_kfold_constant_within_group_and_narrow(spark):
    rows = [(i, i % 37, T0, "view", 1.0) for i in range(300)]
    df = _events(spark, rows)
    out = group_kfold(df, k=5, group="user_id").collect()
    by_group: dict[int, set] = {}
    for r in out:
        assert 0 <= r["fold"] < 5
        by_group.setdefault(r["user_id"], set()).add(r["fold"])
    assert all(len(s) == 1 for s in by_group.values())
    # all 5 folds hit across 37 groups (md5 spread)
    assert len({next(iter(s)) for s in by_group.values()}) == 5
    plan = (
        group_kfold(df, k=5, group="user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_group_kfold_matches_sample_key(spark):
    df = _events(spark, [(0, 42, T0, "view", 1.0)])
    fold = group_kfold(df, k=7, group="user_id").collect()[0]["fold"]
    key = df.select(
        sample_key(df.user_id, "kfold").alias("k")
    ).collect()[0]["k"]
    assert fold == key % 7


# -------------------------------------------------------------- bigram


def test_bigram_logprob_matches_python(spark):
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the cat"),
        (2, "mat the on sat cat the"),  # scrambled: same unigrams
        (3, "single"),  # no bigrams -> excluded
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_toks"], r["oov_toks"], r["nll_micro_sum"])
        for r in bigram_logprob_score(df, vocab_k=4).collect()
    }
    assert 3 not in out and 4 not in out
    # python model: bigram counts over all docs, top-4 vocab
    grams: list[str] = []
    per_doc: dict[int, list] = {}
    for d, text in docs:
        toks = [t for t in text.lower().split() if t]
        bs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if bs:
            per_doc[d] = bs
            grams.extend(bs)
    from collections import Counter

    cnt = Counter(grams)
    total = sum(cnt.values())
    vocab = dict(
        [
            (t, math.floor(math.log(total / n) * 1e6))
            for t, n in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        ]
    )
    oov = math.floor(math.log(2 * total) * 1e6)
    for d, bs in per_doc.items():
        nll = sum(vocab.get(b, oov) for b in bs)
        n_oov = sum(1 for b in bs if b not in vocab)
        assert out[d] == (len(bs), n_oov, nll), d
    # the scrambled doc must score strictly worse than the original
    assert (
        out[2][2] / out[2][0] > out[0][2] / out[0][0]
    ), "scrambled word order should raise bigram NLL"


def test_unigram_refactor_unchanged(spark):
    """The _lm_score extraction must not change unigram results."""
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        unigram_logprob_score,
    )

    df = spark.createDataFrame(
        [(0, "a b a c"), (1, "a a a"), (2, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_toks"], r["nll_micro_sum"])
        for r in unigram_logprob_score(df, vocab_k=2).collect()
    }
    total = 7  # a:4 b:1 c:1 -> 6? no: tokens = a,b,a,c,a,a,a = 7 (a:5,b:1,c:1)
    import math as m

    lp_a = m.floor(m.log(7 / 5) * 1e6)
    lp_b = m.floor(m.log(7 / 1) * 1e6)  # vocab_k=2 keeps a,b (tie: term asc)
    oov = m.floor(m.log(2 * 7) * 1e6)
    assert out[0] == (4, lp_a * 2 + lp_b + oov)
    assert out[1] == (3, lp_a * 3)
    assert 2 not in out
