"""Agreement/fertility batch: Krippendorff's alpha (nominal, ragged
panels), per-language tokenizer fertility."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest


def _brute_alpha(units):
    units = [u for u in units if len(u) >= 2]
    n = sum(len(u) for u in units)
    do = 0.0
    for u in units:
        m = len(u)
        cnt = Counter(u)
        snn1 = sum(c * (c - 1) for c in cnt.values())
        do += (m * (m - 1) - snn1) / (m - 1)
    nc = Counter()
    for u in units:
        nc.update(u)
    snc2 = sum(v * v for v in nc.values())
    if n * n == snc2:
        return None
    return 1 - do * (n - 1) / (n * n - snc2)


def test_krippendorff_brute_force_ragged(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        krippendorff_alpha,
    )

    random.seed(11)
    units, rows = [], []
    for uid in range(60):
        m = random.choice([1, 2, 2, 3, 3])
        cats = [random.choice("abcd") for _ in range(m)]
        units.append(cats)
        rows.extend((uid, c) for c in cats)
    df = spark.createDataFrame(rows, "item_id long, category string")
    got = krippendorff_alpha(df).collect()[0]
    exp = _brute_alpha(units)
    assert got["alpha"] == math.floor(exp * 1e6) / 1e6
    assert got["n_units"] == sum(1 for u in units if len(u) >= 2)
    assert got["n_values"] == sum(len(u) for u in units if len(u) >= 2)
    assert got["n_units_over_cap"] == 0


def test_krippendorff_perfect_constant_and_overcap(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        krippendorff_alpha,
    )

    # perfect agreement across two categories -> alpha = 1
    rows = [(u, "x") for u in range(5) for _ in range(2)]
    rows += [(9, "y"), (9, "y")]
    got = krippendorff_alpha(
        spark.createDataFrame(rows, "item_id long, category string")
    ).collect()[0]
    assert got["alpha"] == 1.0

    # single category everywhere -> expected disagreement 0 -> NULL
    rows = [(u, "x") for u in range(5) for _ in range(3)]
    got = krippendorff_alpha(
        spark.createDataFrame(rows, "item_id long, category string")
    ).collect()[0]
    assert got["alpha"] is None

    # a 4-rating unit under max_raters=3 is excluded and surfaced
    rows = [(1, "a"), (1, "b"), (1, "a"), (1, "b")]
    rows += [(2, "a"), (2, "a"), (3, "a"), (3, "b")]
    got = krippendorff_alpha(
        spark.createDataFrame(rows, "item_id long, category string"),
        max_raters=3,
    ).collect()[0]
    assert got["n_units_over_cap"] == 1
    assert got["n_units"] == 2
    # ...and included exactly when the cap is raised
    got4 = krippendorff_alpha(
        spark.createDataFrame(rows, "item_id long, category string"),
        max_raters=4,
    ).collect()[0]
    assert got4["n_units_over_cap"] == 0
    assert got4["n_units"] == 3
    exp = _brute_alpha([["a", "b", "a", "b"], ["a", "a"], ["a", "b"]])
    assert got4["alpha"] == math.floor(exp * 1e6) / 1e6

    with pytest.raises(ValueError):
        krippendorff_alpha(
            spark.createDataFrame(rows, "item_id long, category string"),
            max_raters=1,
        )


def test_tokenizer_fertility_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        tokenizer_fertility,
    )

    rows = [
        (1, "hello world", "en"),       # 2 tokens, 11 chars
        (2, "a bc def", "en"),          # 3 tokens, 8 chars
        (3, None, "xx"),                # null text -> 0 tokens, 0 chars
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["grp"]: r for r in tokenizer_fertility(df).collect()}
    en = got["en"]
    assert (en["n_docs"], en["n_tokens"], en["n_chars"]) == (2, 5, 19)
    assert en["chars_per_token_micro"] == 19 * 1_000_000 // 5
    assert en["tokens_per_doc_micro"] == 5 * 1_000_000 // 2
    xx = got["xx"]
    assert (xx["n_tokens"], xx["chars_per_token_micro"]) == (0, 0)
