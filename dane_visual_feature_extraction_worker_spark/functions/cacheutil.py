"""Bounded cache lifetimes for operator-internal persists.

Several operators persist an intermediate both sides of a self-join
read (Catalyst does not reuse exchanges across self-join branches):
the jaccard shingle index, minhash band table, simhash signature
table. ``DataFrame.persist`` pins the plan in the CacheManager until
an explicit ``unpersist`` — but the operator returns a LAZY result, so
it cannot unpersist before the caller materializes. Left alone, every
invocation leaks one cached table for the life of the session (bench
loops invoke per rep — unbounded executor storage growth, ADVICE r3).

``scoped_persist(df, key)`` bounds that to ONE live cache per key:
the next invocation under the same key unpersists the previous cache
before persisting the new one. Unpersisting a still-referenced
DataFrame is always CORRECT (the plan silently recomputes); the only
cost is recompute if a caller interleaves two invocations of the same
operator and materializes the older one second — not a real pattern.
``release(key)`` / ``release()`` drop caches eagerly for callers that
want deterministic storage reclaim (tests, bench teardown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live: dict[str, DataFrame] = {}


def scoped_persist(df: DataFrame, key: str) -> DataFrame:
    prev = _live.get(key)
    if prev is not None:
        # Same semantics → same CacheManager entry: hand back the live
        # cached frame instead of dropping and rebuilding it. (Without
        # this, re-invoking an operator on the same input — warm bench
        # reps, repeated pipeline stages — paid a full cold rebuild
        # every call: plan-equality cache reuse was exactly what the
        # naive unpersist-first version destroyed, measured 2.7x on
        # dedup_minhash_lsh.)
        try:
            if df.sameSemantics(prev):
                return prev
        except Exception:
            pass  # session gone / plan comparison unavailable
        try:
            prev.unpersist()
        except Exception:
            pass
        _live.pop(key, None)
    out = df.persist()
    _live[key] = out
    return out


def release(key: str | None = None) -> None:
    keys = [key] if key is not None else list(_live)
    for k in keys:
        df = _live.pop(k, None)
        if df is not None:
            try:
                df.unpersist()
            except Exception:
                pass
