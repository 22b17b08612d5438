"""Similarity search + embedding near-dup over embedding columns (array<float>).

* :func:`cosine_topk` — exact brute-force top-k: broadcast the (small) query
  set against the corpus; per-query top-k via window rank. The correctness
  baseline.
* :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH (sign bits of
  dot products with R seeded hyperplanes), bucket join to produce
  candidates, exact cosine re-rank of candidates. Recall < 1 by
  construction; the probe multiplicity trades recall for cost.
* :func:`ann_ivf_topk` — IVF alternative: seeded k-means coarse quantizer
  (Lloyd iterations as hash aggregations, centroids broadcast each round),
  probe the ``nprobe`` nearest centroid lists, exact re-rank within them.
* :func:`embedding_near_dup_pairs` — exact embedding-cosine near-duplicate
  pairs (i < j, cosine >= threshold); the correctness baseline for dedup.
* :func:`embedding_near_dup_lsh` — the near-dup scale path: LSH self-join
  candidates, exact cosine verification (precision 1, recall < 1).

Vector math strategy (measured on this corpus): the batched kernels — pair
cosine, multi-table bucket signatures, centroid argmin/probe — run as
Arrow-vectorized pandas UDFs over numpy matrices (one GEMM per batch).
Catalyst alternatives were tried and rejected: higher-order
``aggregate(zip_with(...))`` evaluates its lambda through the interpreted
expression path per element (~30x slower), and flat-unrolled
``a[1]*b[1]+...`` expressions blow past codegen method limits once a plan
needs many dot products per row (32 hyperplanes or 16 centroids), falling
back to interpreted evaluation. numpy's C loops + Arrow batch transfer win
by an order of magnitude; per the engine's UDF policy only batch-level
vectorized Python is used, never per-row.

Everything deterministic: hyperplanes/centroid init come from
``random.Random(seed)``, ranking ties break on neighbor id.
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mat(series: pd.Series):
    """Arrow list column -> [n, d] float64 matrix."""
    import numpy as np

    return np.vstack(series.to_numpy()).astype(np.float64)


@F.pandas_udf(T.DoubleType())  # type object: no DDL parse, no context needed at import
def _cosine_pair(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched exact cosine of row-aligned vector pairs (one einsum per
    Arrow batch)."""
    import numpy as np

    A, B = _mat(a), _mat(b)
    num = np.einsum("ij,ij->i", A, B)
    den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    return pd.Series(num / den)


def cosine(a, b):
    """Cosine similarity of two vector columns (batched pandas kernel)."""
    return _cosine_pair(a, b)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _bucket_udf(tables: list[list[list[float]]]):
    """Factory: vector -> array of per-table LSH bucket ids.

    All ``n_tables x n_planes`` sign bits come from ONE [n,d]x[d,T*P] matmul
    per Arrow batch; bit i of a table's bucket is plane i's sign (matching
    the reference ordering bucket += bit << i)."""
    import numpy as np

    n_tab = len(tables)
    n_pl = len(tables[0])
    planes = np.array(tables, dtype=np.float64).reshape(n_tab * n_pl, -1).T
    weights = 1 << np.arange(n_pl, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def f(v: pd.Series) -> pd.Series:
        V = _mat(v)
        bits = (V @ planes) > 0  # [n, n_tab*n_pl]
        buckets = (bits.reshape(len(V), n_tab, n_pl) * weights).sum(axis=2)
        return pd.Series(list(buckets))

    return f


def _assign_udf(centroids: list[list[float]]):
    """Factory: vector -> nearest-centroid id (squared L2, first-index ties),
    via the ||v||^2 - 2 v.C' + ||c||^2 expansion — O(n*k) memory."""
    import numpy as np

    C = np.array(centroids, dtype=np.float64)  # [k, d]
    c2 = (C * C).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def f(v: pd.Series) -> pd.Series:
        V = _mat(v)
        d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c2[None, :]
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return f


def _probe_udf(centroids: list[list[float]], nprobe: int):
    """Factory: vector -> the nprobe nearest centroid ids (ascending
    distance, index tie-break)."""
    import numpy as np

    C = np.array(centroids, dtype=np.float64)
    c2 = (C * C).sum(axis=1)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def f(v: pd.Series) -> pd.Series:
        V = _mat(v)
        d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c2[None, :]
        order = np.argsort(d2, axis=1, kind="stable")[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    return f


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k neighbors for each query vector (excluding itself).

    Output: (query_id, neighbor_id, rank, sim). ``queries`` is broadcast —
    the corpus is scanned once regardless of query count; scoring is one
    numpy einsum per Arrow batch of (corpus x query) pairs.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


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
    tables = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    bucketer = _bucket_udf(tables)

    def with_buckets(df: DataFrame, side_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(side_id),
            F.col(vec_col).alias(f"{side_id}_v"),
            F.posexplode(bucketer(F.col(vec_col))).alias("table_id", "bucket"),
        )

    c = with_buckets(corpus, "neighbor_id")
    q = with_buckets(queries, "query_id")
    cand = (
        c.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        cosine(F.col("query_id_v"), F.col("neighbor_id_v")).alias("sim"),
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
    the LSH scale path); at 100 TB use :func:`embedding_near_dup_lsh`, which
    shuffles ∝ corpus x tables instead."""
    a = df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("iv"))
    b = df.select(F.col(id_col).alias("j"), F.col(vec_col).alias("jv"))
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
    recall is approximate (≈ 1-(1-p)^L, p = (1-θ/π)^n_planes).

    Parameter note: the defaults target recall ≈ 0.9 at threshold 0.4. Low
    thresholds (far pairs) are hyperplane-LSH's weak spot — 4 planes give
    only 16 buckets/table, so at corpus sizes where n/16 pairs-per-bucket
    approaches n^2/2 the candidate set degenerates toward exhaustive and
    the exact operator wins. The crossover favors LSH when the threshold is
    high (true near-dup, >= 0.8: raise n_planes, fewer tables) or the
    corpus is large relative to 2^n_planes buckets."""
    tables = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    bucketer = _bucket_udf(tables)
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.posexplode(bucketer(F.col(vec_col))).alias("table_id", "bucket"),
    )
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
    """Seeded Lloyd k-means on the driver loop: each iteration broadcasts
    the centroids (inside the assignment UDF closure) and runs one hash
    aggregation (per-cluster element-wise sums via ``posexplode``).
    Centroid state is k x dim floats — driver-tiny at any corpus size."""
    init = (
        corpus.select(
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
            F.xxhash64(F.col(vec_col).cast("string"), F.lit(seed)).alias("h"),
        )
        .orderBy("h")
        .limit(k)
        .collect()
    )
    if not init:
        raise ValueError("k-means init: corpus is empty")
    # corpora smaller than k yield fewer init rows — clamp k instead of
    # indexing past the collected centroids (small/filtered corpora degrade
    # to fewer lists rather than crashing)
    centroids = [list(r["v"]) for r in init]
    k = len(centroids)
    for _ in range(iters):
        assigned = corpus.select(
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
            _assign_udf(centroids)(F.col(vec_col)).alias("cluster"),
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

    The corpus-side work is one cluster assignment (a projection — the
    inverted 'index' is just a cluster_id column, so at 100 TB it is a
    bucketed/partitioned write, amortized across every later query batch).
    Query fan-out is |queries| x nprobe broadcast rows; recall is governed
    by nprobe/n_lists."""
    centroids = _kmeans_centroids(corpus, vec_col, n_lists, kmeans_iters, seed, dim)
    nprobe = min(nprobe, len(centroids))  # k was clamped for small corpora
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _assign_udf(centroids)(F.col(vec_col)).alias("cluster"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(_probe_udf(centroids, nprobe)(F.col(vec_col))).alias("cluster"),
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
