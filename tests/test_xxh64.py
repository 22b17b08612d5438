"""Differential test: the pure-Python XXH64 / SimHash replica
(yaschva_spark.xxh64 — used by the DuckDB oracles as an independent
implementation) must be bit-exact with Spark's JVM hashing."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from yaschva_spark.ops import dedup
from yaschva_spark.xxh64 import simhash64, spark_xxhash64_string


def test_xxh64_matches_spark(spark):
    cases = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "abcdefghi", "0123456789" * 4, "héllo wörld", "日本語テキスト",
        "x" * 31, "x" * 32, "x" * 33, "x" * 100, "a b  c ", " lead", "trail ",
    ]
    rng = random.Random(13)
    alphabet = "abc XYZ09!#é中"
    cases += ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80))) for _ in range(60)]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for c in cases:
        assert got[c] == spark_xxhash64_string(c), repr(c)


def test_simhash_matches_spark(spark):
    texts = ["hello world foo", "a", "", "one two  three ", "日本 語", "x y z w " * 10]
    df = spark.createDataFrame(list(enumerate(texts)), "id long, t string")
    got = {r["id"]: r["simhash"] for r in dedup.simhash(df, "id", "t").collect()}
    for i, t in enumerate(texts):
        assert got[i] == simhash64(t), repr(t)
