"""sft_pairs / context_window / collapse_repeats: python brute-force
cross-checks, adjacency/null edge cases, single-exchange plan audits."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from dane_visual_feature_extraction_worker_spark.operators.turns import (
    collapse_repeats,
    context_window,
    sft_pairs,
)

T0 = dt.datetime(2024, 1, 1)
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _tr(spark, rows):
    return spark.createDataFrame(
        [
            (c, i, r, t, None, T0 + dt.timedelta(seconds=i))
            for c, i, r, t in rows
        ],
        SCHEMA,
    )


def test_sft_pairs_adjacency(spark):
    rows = [
        ("a", 0, "user", "q1"),
        ("a", 1, "assistant", "r1"),  # pair
        ("a", 2, "user", "q2"),
        ("a", 3, "tool", "t"),
        ("a", 4, "assistant", "r2"),  # NOT a pair: tool intervenes
        ("a", 5, "assistant", "r3"),  # NOT: previous is assistant
        ("b", 0, "assistant", "r0"),  # NOT: no previous turn
        ("b", 1, "user", "q3"),
        ("b", 2, "assistant", "r4"),  # pair
    ]
    out = {
        (r["conv_id"], r["turn_idx"]): (r["prompt"], r["response"])
        for r in sft_pairs(_tr(spark, rows)).collect()
    }
    assert out == {("a", 1): ("q1", "r1"), ("b", 2): ("q3", "r4")}


def test_context_window_brute_force(spark):
    rng = random.Random(5)
    rows = []
    for c in range(4):
        for i in range(rng.randint(1, 25)):
            rows.append((str(c), i, "user", f"t{c}-{i}"))
    out = {
        (r["conv_id"], r["turn_idx"]): (r["n_ctx"], r["context"])
        for r in context_window(_tr(spark, rows), k=3, sep="|").collect()
    }
    by_conv: dict[str, list] = {}
    for c, i, _, t in rows:
        by_conv.setdefault(c, []).append((i, t))
    for c, evs in by_conv.items():
        evs.sort()
        for pos, (i, _) in enumerate(evs):
            ctx = [t for _, t in evs[max(0, pos - 2) : pos + 1]]
            assert out[(str(c), i)] == (len(ctx), "|".join(ctx))


def test_context_window_null_text(spark):
    rows = [("a", 0, "user", None), ("a", 1, "user", "x")]
    out = sorted(
        (r["turn_idx"], r["context"])
        for r in context_window(_tr(spark, rows), k=2).collect()
    )
    assert out == [(0, ""), (1, "\nx")]


def test_collapse_repeats_brute_force(spark):
    rng = random.Random(11)
    rows = []
    for c in range(5):
        i = 0
        for _ in range(rng.randint(1, 15)):
            role = rng.choice(["user", "assistant"])
            text = rng.choice(["x", "y", None])
            for _ in range(rng.randint(1, 4)):  # build real runs
                rows.append((str(c), i, role, text))
                i += 1
    out = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["n_repeats"])
        for r in collapse_repeats(_tr(spark, rows)).collect()
    }
    # brute force run-length encoding per conv
    by_conv: dict[str, list] = {}
    for c, i, r, t in rows:
        by_conv.setdefault(c, []).append((i, r, t))
    expected = {}
    for c, evs in by_conv.items():
        evs.sort(key=lambda e: e[0])
        runs: list[list] = []
        for i, r, t in evs:
            if runs and (r, t) == (runs[-1][1], runs[-1][2]):
                runs[-1][3] += 1
            else:
                runs.append([i, r, t, 1])
        for i, r, t, n in runs:
            expected[(c, i)] = (r, t, n)
    assert out == expected


def test_collapse_repeats_single_exchange(spark):
    df = _tr(spark, [("a", 0, "user", "x")])
    plan = (
        collapse_repeats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_context_window_bounded_frame(spark):
    df = _tr(spark, [("a", 0, "user", "x")])
    plan = (
        context_window(df, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    low = plan.lower()
    assert "unboundedfollowing" not in low and "unboundedpreceding" not in low, plan


def test_role_alternation_flags(spark):
    """Crafted conversations: clean dialogue, repeat-speaker, off-role
    interjection, assistant-first — each flag fires exactly as
    specified."""
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        role_alternation,
    )

    rows = [
        # clean: user/assistant strict alternation
        ("clean", 0, "user", "q1"), ("clean", 1, "assistant", "a1"),
        ("clean", 2, "user", "q2"), ("clean", 3, "assistant", "a2"),
        # repeat speaker: user twice in a row
        ("rep", 0, "user", "q"), ("rep", 1, "user", "q again"),
        ("rep", 2, "assistant", "a"),
        # off-role tool turn, otherwise alternating
        ("tooly", 0, "user", "q"), ("tooly", 1, "tool", "result"),
        ("tooly", 2, "assistant", "a"),
        # assistant speaks first
        ("afirst", 0, "assistant", "hello"), ("afirst", 1, "user", "hi"),
    ]
    out = {r["conv_id"]: r for r in role_alternation(_tr(spark, rows)).collect()}
    c = out["clean"]
    assert (c["n_turns"], c["n_role_repeats"], c["n_offrole"]) == (4, 0, 0)
    assert c["first_role"] == "user" and c["last_role"] == "assistant"
    assert c["strict_alternation"] is True
    assert out["rep"]["n_role_repeats"] == 1
    assert out["rep"]["strict_alternation"] is False
    assert out["tooly"]["n_offrole"] == 1
    assert out["tooly"]["strict_alternation"] is False
    assert out["tooly"]["n_distinct_roles"] == 3
    af = out["afirst"]
    assert af["n_role_repeats"] == 0 and af["n_offrole"] == 0
    assert af["first_role"] == "assistant"
    assert af["strict_alternation"] is False


def test_role_alternation_single_exchange(spark):
    """The lag window and the per-conv aggregation share ONE
    hash(conv_id) exchange."""
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        role_alternation,
    )

    rows = [("c%d" % (i % 7), i // 7, "user", "t") for i in range(70)]
    plan = role_alternation(
        _tr(spark, rows)
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_echo_rate_containment(spark):
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        echo_rate,
    )

    tr = spark.createDataFrame(
        [
            # conv c1: assistant parrots half, then fully
            ("c1", 0, "user", "alpha beta gamma delta", 0.0),
            ("c1", 1, "assistant", "alpha beta zeta omega", 1.0),
            ("c1", 2, "user", "new question here", 2.0),
            ("c1", 3, "assistant", "new question here", 3.0),
            # conv c2: no echo at all
            ("c2", 0, "user", "one two", 0.0),
            ("c2", 1, "assistant", "three four", 1.0),
            # conv c3: assistant-first (no prev) -> excluded
            ("c3", 0, "assistant", "hello", 0.0),
        ],
        "conv_id string, turn_idx int, role string, text string, s double",
    )
    import pyspark.sql.functions as F

    tr = tr.select(
        "conv_id", "turn_idx", "role", "text",
        F.timestamp_seconds(1_700_000_000 + F.col("s")).alias("ts"),
    )
    got = {r["conv_id"]: r for r in echo_rate(tr).collect()}
    # c1 pair 1: 2 of 4 tokens echoed -> 500000; pair 2: 3/3 -> 1000000
    assert got["c1"]["n_pairs"] == 2
    assert got["c1"]["echo_avg_micro"] == (500_000 + 1_000_000) // 2
    assert got["c1"]["echo_max_micro"] == 1_000_000
    assert got["c2"]["echo_avg_micro"] == 0
    assert "c3" not in got


def test_template_openers_normalization_and_share(spark):
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        template_openers,
    )
    import pyspark.sql.functions as F

    rows = []
    # 3 convs open with formatting variants of the same template
    for i, variant in enumerate(
        ["Hello!  How can I help?", "hello! how can i help?",
         "HELLO!\thow can I help?"]
    ):
        rows.append((f"c{i}", 0, "user", "hi", 0.0))
        rows.append((f"c{i}", 1, "assistant", variant, 1.0))
        rows.append((f"c{i}", 2, "assistant", "later turn ignored", 2.0))
    # 1 conv opens uniquely
    rows.append(("c9", 0, "assistant", "unique opener", 0.0))
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, s double"
    ).select(
        "conv_id", "turn_idx", "role", "text",
        F.timestamp_seconds(1_700_000_000 + F.col("s")).alias("ts"),
    )
    out = template_openers(tr, k=5).collect()
    assert [r["n_convs"] for r in out] == [3, 1]
    assert out[0]["snippet"].startswith("hello! how can i help?")
    assert out[0]["share_micro"] == 3 * 1_000_000 // 4
    assert out[1]["share_micro"] == 1_000_000 // 4

    import pytest as _pytest

    with _pytest.raises(ValueError):
        template_openers(tr, k=0)


# ------------------------- retry_runs / conv_outcomes / conv dedup


def _brute_retry(rows):
    from collections import defaultdict

    by_conv = defaultdict(list)
    for c, i, r, t in rows:
        by_conv[c].append((i, r, t))
    out = {}
    for c, turns in by_conv.items():
        turns.sort()
        runs = []
        for _, r, t in turns:
            if runs and runs[-1][0] == (r, t):
                runs[-1][1] += 1
            else:
                runs.append([(r, t), 1])
        lens = [n for _, n in runs]
        out[c] = (
            sum(lens),
            len(lens),
            sum(1 for n in lens if n >= 2),
            max(lens),
            sum(n - 1 for n in lens if n >= 2),
        )
    return out


def test_retry_runs_brute_force(spark):
    random.seed(7)
    rows = []
    for c in range(8):
        n = random.randint(1, 20)
        for i in range(n):
            # small alphabet so real runs occur
            r = random.choice(["user", "assistant"])
            t = random.choice(["x", "y"])
            rows.append((f"c{c}", i, r, t))
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        retry_runs,
    )

    got = {
        r["conv_id"]: (
            r["n_turns"],
            r["n_runs"],
            r["n_retry_runs"],
            r["max_run"],
            r["wasted_turns"],
        )
        for r in retry_runs(_tr(spark, rows)).collect()
    }
    assert got == _brute_retry(rows)


def test_retry_runs_null_text_is_a_run(spark):
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        retry_runs,
    )

    rows = [
        ("a", 0, "assistant", None),
        ("a", 1, "assistant", None),  # null == null: one run of 2
        ("a", 2, "user", "q"),
    ]
    (row,) = retry_runs(_tr(spark, rows)).collect()
    assert (row["n_runs"], row["n_retry_runs"], row["max_run"]) == (2, 1, 2)
    assert row["wasted_turns"] == 1


def test_conv_outcomes_last_role_and_share(spark):
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        conv_outcomes,
    )

    rows = [
        ("a", 0, "user", "q"),
        ("a", 1, "assistant", "r"),  # ends assistant, 2 turns
        ("b", 0, "user", "q"),       # ends user (abandoned), 1 turn
        ("c", 0, "user", "q"),
        ("c", 1, "assistant", "r"),
        ("c", 2, "user", "q2"),      # ends user, 3 turns
        ("d", 0, "tool", "t"),       # ends tool, 1 turn
    ]
    got = {
        r["outcome_role"]: (
            r["n_convs"],
            r["share_micro"],
            r["turns_avg_micro"],
        )
        for r in conv_outcomes(_tr(spark, rows)).collect()
    }
    assert got == {
        "assistant": (1, 250000, 2000000),
        "user": (2, 500000, 2000000),  # (1+3)/2 turns
        "tool": (1, 250000, 1000000),
    }


def test_dedup_conversations_groups_and_keeper(spark):
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        dedup_conversations,
    )

    rows = [
        # b and a are content-identical (roles+texts in order)
        ("a", 0, "user", "q"),
        ("a", 1, "assistant", "r"),
        ("b", 0, "user", "q"),
        ("b", 1, "assistant", "r"),
        # c differs in one text
        ("c", 0, "user", "q"),
        ("c", 1, "assistant", "R"),
    ]
    out = {
        r["conv_id"]: (r["group_size"], r["is_keep"], r["digest"])
        for r in dedup_conversations(_tr(spark, rows)).collect()
    }
    assert out["a"][0] == 2 and out["b"][0] == 2 and out["c"][0] == 1
    assert out["a"][1] == 1 and out["b"][1] == 0  # keeper = min conv_id
    assert out["c"][1] == 1
    assert out["a"][2] == out["b"][2] != out["c"][2]


def test_dedup_conversations_order_independence(spark):
    """The digest is re-sorted after partial merges — shuffled input
    row order and different partition counts give identical digests."""
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        dedup_conversations,
    )

    rows = [("a", i, "user", f"t{i}") for i in range(12)]
    shuffled = rows[::-1]
    d1 = dedup_conversations(_tr(spark, rows)).collect()[0]["digest"]
    d2 = dedup_conversations(
        _tr(spark, shuffled).repartition(7)
    ).collect()[0]["digest"]
    assert d1 == d2


# -------------------------------------- prefix_reuse / length_drift


def test_prefix_reuse_depth_shares(spark):
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        prefix_reuse,
    )

    # a and b share turn 0; diverge at turn 1. c is unique.
    rows = [
        ("a", 0, "user", "hello"),
        ("a", 1, "assistant", "A"),
        ("b", 0, "user", "hello"),
        ("b", 1, "assistant", "B"),
        ("c", 0, "user", "other"),
    ]
    out = {
        r["depth"]: (r["n_convs"], r["n_reused"], r["n_prefixes"])
        for r in prefix_reuse(_tr(spark, rows), depths=(1, 2)).collect()
    }
    assert out[1] == (3, 2, 2)  # a+b share the depth-1 prefix
    assert out[2] == (3, 0, 3)  # all diverge by depth 2


def test_prefix_reuse_short_conv_clamps(spark):
    """Two identical 1-turn convs still collide at depth 4 (their full
    prefix IS the conversation)."""
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        prefix_reuse,
    )

    rows = [("a", 0, "user", "hi"), ("b", 0, "user", "hi")]
    out = {
        r["depth"]: r["n_reused"]
        for r in prefix_reuse(_tr(spark, rows), depths=(4,)).collect()
    }
    assert out[4] == 2


def test_prefix_reuse_validation(spark):
    import pytest as _pt

    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        prefix_reuse,
    )

    with _pt.raises(ValueError):
        prefix_reuse(_tr(spark, [("a", 0, "user", "x")]), depths=(0,))


def test_length_drift_brute_force(spark):
    import math
    import random as rnd

    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        length_drift,
    )

    rnd.seed(17)
    rows = []
    for c in range(6):
        for i in range(rnd.randint(1, 15)):
            rows.append(
                (f"c{c}", i, "user", " ".join(["w"] * rnd.randint(1, 9)))
            )
    got = {
        r["conv_id"]: (r["n_turns"], r["n_tokens"], r["slope"])
        for r in length_drift(_tr(spark, rows)).collect()
    }
    from collections import defaultdict

    by_conv = defaultdict(list)
    for c, i, _, t in rows:
        by_conv[c].append((i, len(t.split())))
    for c, pts in by_conv.items():
        n = len(pts)
        si = sum(i for i, _ in pts)
        sii = sum(i * i for i, _ in pts)
        sl = sum(l for _, l in pts)
        sil = sum(i * l for i, l in pts)
        den = n * sii - si * si
        slope = (
            math.floor((n * sil - si * sl) / den * 1e6) / 1e6
            if den > 0
            else None
        )
        assert got[c] == (n, sl, slope), c


def test_length_drift_known_slopes(spark):
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        length_drift,
    )

    rows = (
        # collapsing: lengths 5,3,1 over idx 0,1,2 -> slope -2
        [("down", i, "user", " ".join(["w"] * (5 - 2 * i))) for i in range(3)]
        # single turn -> NULL slope
        + [("solo", 0, "user", "a b c")]
    )
    got = {
        r["conv_id"]: r["slope"] for r in length_drift(_tr(spark, rows)).collect()
    }
    assert got["down"] == -2.0 and got["solo"] is None
