"""Similarity search + embedding near-dup over embedding columns (array<float>).

* :func:`cosine_topk` — exact brute-force top-k: broadcast the (small) query
  set against the corpus; cosine via zip_with + aggregate (pure Catalyst,
  JVM-side); per-query top-k via window rank. The correctness baseline.
* :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH (sign bits of
  dot products with R seeded hyperplanes, computed as Catalyst expressions),
  bucket join to produce candidates, exact cosine re-rank of candidates.
  Recall < 1 by construction; the probe multiplicity trades recall for cost.
* :func:`ann_ivf_topk` — IVF alternative: seeded k-means coarse quantizer
  (Lloyd iterations as hash aggregations, centroids broadcast each round),
  probe the ``nprobe`` nearest centroid lists, exact re-rank within them.
* :func:`embedding_near_dup_pairs` — exact embedding-cosine near-duplicate
  pairs (i < j, cosine >= threshold); the correctness baseline for dedup.
* :func:`embedding_near_dup_lsh` — the near-dup scale path: LSH self-join
  candidates, exact cosine verification (precision 1, recall < 1).

Everything deterministic: hyperplanes/centroid init come from
``random.Random(seed)``, ranking ties break on neighbor id.
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


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (i, j, sim) with i < j
    and cosine >= threshold.

    O(n^2/2) pairwise — the correctness baseline (and the oracle target for
    the LSH scale path). The self-join is a broadcast of the smaller
    projection when it fits; at 100 TB use :func:`embedding_near_dup_lsh`,
    which shuffles ∝ corpus x tables instead."""
    a = df.select(F.col(id_col).alias("i"), _as_double(F.col(vec_col)).alias("iv"))
    b = df.select(F.col(id_col).alias("j"), _as_double(F.col(vec_col)).alias("jv"))
    return (
        a.join(b, F.col("i") < F.col("j"))
        .select("i", "j", cosine(F.col("iv"), F.col("jv")).alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("i", "j", F.round("sim", 6).alias("sim"))
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 12,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Near-dup scale path: multi-table hyperplane-LSH self-join produces
    candidate pairs (shuffle ∝ corpus x n_tables, never O(n^2)); every
    candidate is exactly cosine-verified, so precision is 1.0 and only
    recall is approximate (≈ 1-(1-p)^L, p = (1-θ/π)^n_planes)."""
    tables = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    bucketed = df.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
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
    ).select("id", "v", "tb.table_id", "tb.bucket")
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("i"), F.col("b.id").alias("j"),
            F.col("a.v").alias("iv"), F.col("b.v").alias("jv"),
        )
        .dropDuplicates(["i", "j"])
    )
    return (
        cand.select("i", "j", cosine(F.col("iv"), F.col("jv")).alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("i", "j", F.round("sim", 6).alias("sim"))
    )


def _kmeans_centroids(
    corpus: DataFrame, vec_col: str, k: int, iters: int, seed: int, dim: int
) -> list[list[float]]:
    """Seeded Lloyd k-means on the driver loop: each iteration is one
    broadcast (centroid literals) + one hash aggregation (per-cluster
    element-wise sums via ``posexplode``). Centroid state is k x dim floats —
    driver-tiny at any corpus size."""
    init = (
        corpus.select(_as_double(F.col(vec_col)).alias("v"),
                      F.xxhash64(F.col(vec_col).cast("string"), F.lit(seed)).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids = [list(r["v"]) for r in init]
    for _ in range(iters):
        assigned = corpus.select(
            _as_double(F.col(vec_col)).alias("v"),
            _nearest_centroid(F.col(vec_col), centroids).alias("cluster"),
        )
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc: dict[int, list[float]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = r["s"]
            cnt[r["cluster"]] = r["n"]
        centroids = [
            [x / cnt[c] for x in acc[c]] if c in acc else centroids[c]
            for c in range(k)
        ]
    return centroids


def _nearest_centroid(vec_col, centroids: list[list[float]]):
    """argmin over centroid literals of squared L2 distance — pure Catalyst."""
    v = _as_double(vec_col)
    best_d = F.lit(float("inf"))
    best_i = F.lit(-1)
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(x) for x in c])
        d = F.aggregate(
            F.zip_with(v, carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        best_i = F.when(d < best_d, F.lit(i)).otherwise(best_i)
        best_d = F.least(d, best_d)
    return best_i


def _nearest_centroids_n(vec_col, centroids: list[list[float]], nprobe: int):
    """Array of the nprobe nearest centroid ids — sort a (dist, id) struct
    array and slice. Catalyst-only."""
    v = _as_double(vec_col)
    entries = []
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(x) for x in c])
        d = F.aggregate(
            F.zip_with(v, carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        entries.append(F.struct(d.alias("d"), F.lit(i).alias("c")))
    ordered = F.array_sort(F.array(*entries))
    return F.transform(F.slice(ordered, 1, nprobe), lambda s: s["c"])


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_lists: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 3,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer -> inverted lists ->
    probe the nprobe nearest lists per query -> exact cosine re-rank.

    The corpus-side shuffle is one cluster assignment (a projection — the
    inverted 'index' is just a cluster_id column, so at 100 TB it is a
    bucketed/partitioned write, amortized across every later query batch).
    Query fan-out is |queries| x nprobe broadcast rows; recall is governed
    by nprobe/n_lists."""
    centroids = _kmeans_centroids(corpus, vec_col, n_lists, kmeans_iters, seed, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        _nearest_centroid(F.col(vec_col), centroids).alias("cluster"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.explode(
            _nearest_centroids_n(F.col(vec_col), centroids, nprobe)
        ).alias("cluster"),
    )
    scored = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )
