"""Caller-owned lifetime for operator-internal persisted DataFrames.

Operators like :func:`yaschva_spark.ops.dedup.minhash_lsh_pairs` persist an
intermediate (the shingle/signature table feeds three plan branches) but
return a *lazy* DataFrame — they cannot unpersist before the caller's
action runs. Persisting through this registry gives callers the handle the
operator can't: run your actions, then call :func:`unpersist_intermediates`
to drop every cached block the operators pinned. bench.py and the test
fixtures do this between queries; long-lived sessions that skip it simply
let Spark's LRU evict the blocks, but the explicit release keeps repeated
operator calls from accumulating cached copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for later bulk release."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def unpersist_intermediates() -> int:
    """Unpersist every registered intermediate; returns how many."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
        n += 1
    return n
