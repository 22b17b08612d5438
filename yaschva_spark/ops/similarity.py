"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — exact brute-force top-k: broadcast the (small) query
  set against the corpus; cosine via zip_with + aggregate (pure Catalyst,
  JVM-side); per-query top-k via window rank. The correctness baseline.
* :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH (sign bits of
  dot products with R seeded hyperplanes, computed as Catalyst expressions),
  bucket join to produce candidates, exact cosine re-rank of candidates.
  Recall < 1 by construction; the probe multiplicity trades recall for cost.

Everything deterministic: hyperplanes come from ``random.Random(seed)``,
ranking ties break on neighbor id.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k neighbors for each query vector (excluding itself).

    Output: (query_id, neighbor_id, rank, sim). ``queries`` is broadcast —
    the corpus is scanned once regardless of query count; the per-row cost is
    |queries| dot products inside whole-stage codegen.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id from seeded random hyperplanes — a Catalyst
    expression (one dot product per plane)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(x) for x in plane])
        bit = (_dot(_as_double(vec_col), plane_arr) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.

    A single table's bucket-collision probability for neighbors at angle θ is
    (1 - θ/π)^n_planes — too low for weakly-correlated corpora — so L
    independent tables are unioned (recall ≈ 1-(1-p)^L) before one exact
    cosine re-rank of the deduplicated candidates. Candidate-join shuffle is
    ∝ corpus x n_tables, never O(n^2)."""
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]

    def with_buckets(df: DataFrame, side_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(side_id),
            _as_double(F.col(vec_col)).alias(f"{side_id}_v"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table_id"),
                            lsh_bucket(F.col(vec_col), tables[t]).alias("bucket"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(side_id, f"{side_id}_v", "tb.table_id", "tb.bucket")

    c = with_buckets(corpus, "neighbor_id")
    q = with_buckets(queries, "query_id")
    cand = (
        c.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine("query_id_v", "neighbor_id_v").alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )
