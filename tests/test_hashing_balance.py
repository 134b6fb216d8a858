"""Feature-hasher collision + partition-balance batch."""

from __future__ import annotations

import hashlib
from collections import Counter

import pyspark.sql.functions as F
import pytest


def _bucket(term, dim):
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % dim


def test_hashing_collisions_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.encoding import (
        hashing_collisions,
    )
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        _tokens,
    )

    texts = ["a b c d e f", "a a b g h", "i j k"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    dim = 4
    got = hashing_collisions(df, _tokens("text"), n_buckets=dim).collect()[0]
    cnt = Counter(t for x in texts for t in x.split())
    buckets = Counter()
    mass = Counter()
    for t, c in cnt.items():
        b = _bucket(t, dim)
        buckets[b] += 1
        mass[b] += c
    collided_terms = sum(n for n in buckets.values() if n >= 2)
    mass_collided = sum(mass[b] for b, n in buckets.items() if n >= 2)
    assert got["n_terms"] == len(cnt)
    assert got["buckets_used"] == len(buckets)
    assert got["collided_terms"] == collided_terms
    assert got["mass_collided"] == mass_collided
    assert got["mass_collided_micro"] == mass_collided * 1_000_000 // sum(
        cnt.values()
    )
    # dim >> vocab: no collisions possible only if buckets distinct;
    # with a huge dim the collision mass must drop to 0 here
    wide = hashing_collisions(df, _tokens("text"), n_buckets=1 << 30).collect()[0]
    assert wide["collided_terms"] == 0 and wide["mass_collided_micro"] == 0
    with pytest.raises(ValueError):
        hashing_collisions(df, _tokens("text"), n_buckets=0)


def test_partition_balance_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.encoding import (
        partition_balance,
    )

    rows = [(k, i) for i, k in enumerate(["u1"] * 5 + ["u2"] * 3 + ["u3"] * 2)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {r["p"]: r for r in partition_balance(df, "k", (2, 4)).collect()}
    for p in (2, 4):
        loads = Counter()
        for k, n in (("u1", 5), ("u2", 3), ("u3", 2)):
            loads[_bucket(k, p)] += n
        r = got[p]
        assert r["n_rows"] == 10
        assert r["max_rows"] == max(loads.values())
        assert r["buckets_used"] == len(loads)
        assert r["balance_micro"] == max(loads.values()) * p * 1_000_000 // 10
    with pytest.raises(ValueError):
        partition_balance(df, "k", ())
