"""Deterministic dataset splitting/sampling for training pipelines.

A 100 TB training pipeline cannot use ``df.randomSplit``/``df.sample`` for
its train/val/test cut: those are partition-RNG based, so the assignment of
a given row changes with partitioning, task retries, and appends. Here the
assignment is a pure function of the row's id — ``pmod(xxhash64(seed, id),
GRANULARITY)`` against cumulative weight boundaries — which makes it

* **reproducible**: any re-run, any cluster size, same split;
* **stable under appends**: new rows join splits at the right rates while
  old rows never move (no need to persist an assignment table);
* **shuffle-free**: a projection/filter, fully inside whole-stage codegen,
  pushed to the scan when the id is all the filter needs.

The front-seeded hash chain (seed literal FIRST — see
checks._key_fingerprint for why trailing seeds are not independent) is
replicated bit-exactly in pure Python (yaschva_spark.xxh64), which is what
lets an independent SQL oracle verify every assignment: Spark's
``xxhash64`` of a LongType child is XXH64 of its 8 little-endian bytes
(XXH64.hashLong's specialization is arithmetically the generic byte path
at n=8), chained left-to-right.
"""

from __future__ import annotations

import struct
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yaschva_spark.xxh64 import xxh64

GRANULARITY = 1_000_000


def _bucket_col(id_col: str, seed: int) -> Column:
    # BOTH children cast to long so Spark hashes 8 bytes each (int-typed
    # children take the 4-byte hashInt path, which would diverge from the
    # replica AND move every row's split on an int->bigint id migration)
    h = F.xxhash64(F.lit(seed).cast("long"), F.col(id_col).cast("long"))
    return F.pmod(h, F.lit(GRANULARITY))


def _boundaries(weights: Mapping[str, float]) -> list[tuple[str, int]]:
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to > 0")
    acc = 0.0
    out = []
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for split {name!r}")
        acc += w / total
        out.append((name, min(int(round(acc * GRANULARITY)), GRANULARITY)))
    out[-1] = (out[-1][0], GRANULARITY)  # close the last range exactly
    return out


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float] | None = None,
    seed: int = 7,
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic split label: ``weights`` (insertion-ordered) are
    normalized into contiguous bucket ranges of the id hash. Default
    98/1/1 train/val/test."""
    weights = weights if weights is not None else {"train": 0.98, "val": 0.01, "test": 0.01}
    bounds = _boundaries(weights)
    b = _bucket_col(id_col, seed)
    expr = None
    for name, hi in bounds:
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr)


def hash_sample(df: DataFrame, id_col: str, fraction: float, seed: int = 7) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose id-hash bucket
    falls below the fraction boundary. Unlike ``df.sample`` the kept set is
    a pure function of ids — re-runs, different partitionings, and
    incremental appends all agree."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    hi = int(round(fraction * GRANULARITY))
    return df.filter(_bucket_col(id_col, seed) < hi)


# --- the independent replica (oracle side) -----------------------------------
def replica_bucket(id_value: int, seed: int = 7) -> int:
    """Pure-Python value of ``_bucket_col`` for one long id — the chained
    XXH64 replica: hash the seed's 8 LE bytes with Spark's default seed 42,
    then the id's 8 LE bytes seeded by that result."""
    h1 = xxh64(struct.pack("<q", seed), 42)
    h2 = xxh64(struct.pack("<Q", id_value & 0xFFFFFFFFFFFFFFFF), h1)
    # Spark's pmod sees the SIGNED long; 10^6 does not divide 2^64, so the
    # unsigned residue differs for negative hashes — convert first (Python's
    # % on a negative operand already matches pmod)
    signed = h2 - (1 << 64) if h2 >= (1 << 63) else h2
    return signed % GRANULARITY


def replica_split(id_value: int, weights: Mapping[str, float], seed: int = 7) -> str:
    b = replica_bucket(id_value, seed)
    for name, hi in _boundaries(weights):
        if b < hi:
            return name
    raise AssertionError("unreachable: boundaries close at GRANULARITY")
