"""Plan-contract tests: the physical properties the engine's scale story
depends on, asserted so a refactor can't silently regress them."""

from __future__ import annotations

from pyspark.sql import functions as F

from yaschva_spark import checks
from yaschva_spark.engine import validate_table
from yaschva_spark.fixtures import CODE_SCHEMA

SF = "/root/testdata/sf0.001"


def _physical(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_typed_validation_is_pure_catalyst(spark):
    """The typed path must stay whole-stage-codegen-able: no Python eval
    node, no shuffle — validation is a projection."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    schema = {
        "doc_id": "integer",
        "text": {"$string": {"minLength": 1, "maxLength": 500}},
        "lang": {"$enum": ["en", "fr", "es", "zh", "de"]},
        "source": {"$string": {"minLength": 1}},
        "n_chars": {"$number": {"min": 0, "max": 600}},
    }
    p = _physical(validate_table(docs, schema))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p  # no shuffle: validation is per-row


def test_ri_orphans_broadcasts_dimension(spark):
    fact = spark.read.parquet(f"{SF}/events.parquet")
    dim = spark.read.parquet(f"{SF}/customer.parquet")
    p = _physical(checks.ri_orphans(fact, "user_id", dim, "c_custkey"))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_uniqueness_single_exchange(spark):
    """duplicate_keys is one partial+final hash agg pair: exactly one
    shuffle of the key columns, nothing else."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = _physical(checks.duplicate_keys(li, ["l_orderkey", "l_linenumber"]))
    assert p.count("Exchange") == 1, p


def test_column_stats_prunes_scan(spark):
    """Selecting stats over two columns must not read the whole table."""
    # a prior module's persisted full-table read would plan-match this scan
    # and CacheManager would swap in an InMemoryTableScan (no ReadSchema
    # line at all) — clear it; this test asserts the uncached scan shape
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("lang", "n_chars")
    agg = docs.agg(F.countDistinct("lang"), F.avg("n_chars"))
    p = _physical(agg)
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read and "text" not in read[0] and "source" not in read[0], p


def test_validation_pipeline_scan_count(spark):
    """The flagship validated projection feeds the manifest agg without a
    Python stage; content digest stays JVM-side (sha2 + conv + bit_xor)."""
    from yaschva_spark.fixtures import code_files

    code = code_files(spark, 2000, seed=3)
    validated = validate_table(code, CODE_SCHEMA)
    manifest = validated.groupBy().agg(
        F.bit_xor(
            F.conv(F.substring(F.sha2(F.col("content"), 256), 1, 15), 16, 10).cast("long")
        ).alias("digest")
    )
    p = _physical(manifest)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_hash_split_is_pure_projection(spark):
    from yaschva_spark.ops.split import hash_split

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _physical(hash_split(docs, "doc_id"))
    assert "Exchange" not in p and "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_apply_dedup_broadcasts_droplist(spark):
    from yaschva_spark.ops.dedup import apply_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    clusters = spark.createDataFrame([(5, 1), (1, 1), (9, 9)], "id long, cluster long")
    p = _physical(apply_dedup(docs, clusters, "doc_id"))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_numeric_profile_single_exchange_no_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _physical(checks.numeric_profile(docs, "lang", "n_chars"))
    assert p.count("Exchange") == 1, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_semdedup_single_shuffle(spark):
    from yaschva_spark.ops.similarity import semdedup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = [[0.0] * 63 + [1.0], [1.0] + [0.0] * 63]
    p = _physical(semdedup_pairs(emb, centroids=cents))
    # one hash partition by cluster feeds the per-cell GEMM; no
    # candidate-pair join exists anywhere in the plan
    assert p.count("Exchange") == 1, p
    assert "SortMergeJoin" not in p and "BroadcastNestedLoopJoin" not in p
