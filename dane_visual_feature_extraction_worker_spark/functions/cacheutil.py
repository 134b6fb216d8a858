"""Bounded cache lifetimes for operator-internal persists.

Several operators persist an intermediate both sides of a self-join
read (Catalyst does not reuse exchanges across self-join branches):
the jaccard shingle index, minhash band table, simhash signature
table. ``DataFrame.persist`` pins the plan in the CacheManager until
an explicit ``unpersist`` — but the operator returns a LAZY result, so
it cannot unpersist before the caller materializes. Left alone, every
invocation leaks one cached table for the life of the session (bench
loops invoke per rep — unbounded executor storage growth, ADVICE r3).

``scoped_persist(df, key)`` bounds that to ONE live cache per
(session, key): the next invocation under the same key *in the same
SparkSession* unpersists the previous cache before persisting the new
one. Keying by session id means two concurrent pipelines in different
sessions never evict each other's index (ADVICE r4), and a lock keeps
the registry consistent when operators run from multiple threads of
one driver (Spark itself is thread-safe for concurrent actions).
Unpersisting a still-referenced DataFrame is always CORRECT (the plan
silently recomputes); the only cost is recompute if a caller
interleaves two invocations of the same operator *in one session* and
materializes the older one second — not a real pattern. ``release``
also reaps entries whose session has stopped, so long-lived drivers
that cycle sessions don't accumulate dead references.
``release(key)`` / ``release()`` drop caches eagerly for callers that
want deterministic storage reclaim (tests, bench teardown).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_live: dict[tuple[str, str], DataFrame] = {}
_lock = threading.Lock()


def _session_id(df: DataFrame) -> str:
    try:
        return df.sparkSession.sparkContext.applicationId
    except Exception:
        return "<unknown>"


def _session_stopped(df: DataFrame) -> bool:
    try:
        return df.sparkSession.sparkContext._jsc is None
    except Exception:
        return True


def scoped_persist(df: DataFrame, key: str) -> DataFrame:
    k = (_session_id(df), key)
    with _lock:
        prev = _live.get(k)
        if prev is not None:
            # Same semantics → same CacheManager entry: hand back the
            # live cached frame instead of dropping and rebuilding it.
            # (Without this, re-invoking an operator on the same input —
            # warm bench reps, repeated pipeline stages — paid a full
            # cold rebuild every call: plan-equality cache reuse was
            # exactly what the naive unpersist-first version destroyed,
            # measured 2.7x on dedup_minhash_lsh.)
            try:
                if df.sameSemantics(prev):
                    return prev
            except Exception:
                pass  # session gone / plan comparison unavailable
            try:
                prev.unpersist()
            except Exception:
                pass
            _live.pop(k, None)
        out = df.persist()
        _live[k] = out
        return out


def release(key: str | None = None) -> None:
    with _lock:
        keys = [
            k
            for k in list(_live)
            if key is None or k[1] == key or _session_stopped(_live[k])
        ]
        for k in keys:
            df = _live.pop(k, None)
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass
