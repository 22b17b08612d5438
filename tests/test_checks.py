"""Direct unit tests for table-level checks not fully covered by the
DuckDB oracle gate: KS drift (applyInPandas, no SQL oracle), the salted
uniqueness path, and column_stats' HLL sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yaschva_spark import checks


def test_drift_ks_orders_groups_by_shift(spark):
    # group 'same' draws from the pooled distribution; group 'shifted' is
    # displaced by +500 — its KS statistic must dominate
    base = spark.range(0, 4000).select(
        F.lit("same").alias("g"), (F.col("id") % 1000).cast("double").alias("x")
    )
    shifted = spark.range(0, 4000).select(
        F.lit("shifted").alias("g"),
        ((F.col("id") % 1000) + 500).cast("double").alias("x"),
    )
    df = base.unionByName(shifted)
    got = {r["g"]: r for r in checks.drift_ks(df, "g", "x").collect()}
    assert set(got) == {"same", "shifted"}
    assert got["same"]["n_rows"] == 4000 and got["shifted"]["n_rows"] == 4000
    # the pooled ECDF sits halfway between the two groups: each group
    # deviates ~0.25 at the crossover, the shifted one strictly more than
    # the unshifted one can't be near zero either — assert the ordering and
    # sane magnitudes rather than exact values (grid is approximate)
    assert got["shifted"]["ks_stat"] > got["same"]["ks_stat"] - 1e-9
    assert 0.1 < got["shifted"]["ks_stat"] <= 1.0
    # identical-to-pooled sanity: a lone group IS the pooled distribution
    solo = base.withColumn("g", F.lit("only"))
    stat = checks.drift_ks(solo, "g", "x").collect()[0]["ks_stat"]
    assert stat < 0.05


def test_drift_ks_empty_group_values(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None)], "g string, x double"
    )
    got = {r["g"]: r["ks_stat"] for r in checks.drift_ks(df, "g", "x").collect()}
    # a group with no values keeps its row; the statistic comes back SQL
    # NULL (Arrow folds the kernel's NaN into null for a double column)
    assert got["b"] is None
    assert got["a"] is not None


def test_salted_duplicate_keys_matches_plain(spark):
    df = spark.createDataFrame(
        [(i % 7, "k") for i in range(100)] + [(99, "x")], "a long, b string"
    )
    plain = {(r["a"], r["b"]): r["dup_count"]
             for r in checks.duplicate_keys(df, ["a", "b"]).collect()}
    salted = {(r["a"], r["b"]): r["dup_count"]
              for r in checks.duplicate_keys(df, ["a", "b"], salt_buckets=5).collect()}
    fp = {(r["a"], r["b"]): r["dup_count"]
          for r in checks.duplicate_keys_via_fingerprint(df, ["a", "b"]).collect()}
    assert plain == salted == fp
    assert all(v == 100 // 7 + (1 if k[0] < 100 % 7 else 0) for k, v in plain.items())


def test_column_stats_hll_sanity(spark):
    df = spark.range(0, 20000).select(
        (F.col("id") % 1234).alias("k"), F.col("id").cast("double").alias("v")
    )
    stats = {r["column"]: r for r in checks.column_stats(df).collect()}
    assert abs(stats["k"]["approx_distinct"] - 1234) / 1234 < 0.05
    assert stats["v"]["null_count"] == 0
    assert stats["v"]["min_value"] == 0.0 and stats["v"]["max_value"] == 19999.0
