"""Source/sink seam (SURVEY.md §7.3).

In this sandbox tables are parquet directories; at production scale the same
engine reads Iceberg — the difference is session config, not engine code:

    get_spark(extra_conf={
        "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.lake.type": "rest",           # or hive/hadoop
        "spark.sql.catalog.lake.uri": "<catalog-uri>",
        # plus iceberg-spark-runtime on the cluster classpath
    })
    read_table(spark, "lake.db.code_files")

Keeping every read/write behind these helpers means partition pruning,
snapshot isolation, and manifest-based resume keep working when the storage
layer changes underneath.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """``ref`` is a parquet path (contains '/' or exists on disk) or a
    catalog table name (``catalog.db.table``)."""
    if "/" in ref or os.path.exists(ref):
        return spark.read.parquet(ref)
    return spark.read.table(ref)


def read_sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver-testdata convention: ``{sf_dir}/{name}.parquet``."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_table(df: DataFrame, ref: str, mode: str = "append",
                partition_by: tuple[str, ...] = ()) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if "/" in ref:
        writer.parquet(ref)
    else:
        writer.saveAsTable(ref)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: tuple[str, ...],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed (+sorted) table write — the co-location contract for
    repeated big-big joins. Two tables bucketed by the same keys into the
    same bucket count join with ZERO exchange: the bucketed scan itself
    reports the join's required hashpartitioning, and with ``sort=True``
    the per-bucket sort order removes the SortMergeJoin's sorts too. At
    100 TB this deletes the dominant shuffle of a fact-fact join from
    every downstream job that reuses the layout — pay the partitioning
    once at write time, amortize it across all consumers. Parquet bucketed
    tables here; Iceberg ``bucket(N, key)`` partition transforms carry the
    same contract at production (see the module header's config seam).

    Bucketing is table metadata, so this is ``saveAsTable`` only (a bare
    path write cannot record the bucket spec); pass ``path`` to keep the
    data external to the warehouse dir."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if not keys:
        raise ValueError("at least one bucket key is required")
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
