"""Structured Streaming validation.

The typed compiler emits pure column expressions, so the SAME compiled
schema runs unchanged on a streaming DataFrame — validation is a stateless
projection (no watermark needed). State enters only at the aggregation
layer: windowed violation-rate monitoring uses event-time windows + a
watermark so late events are bounded and state is evictable.

At scale this is the continuous-ingest shape of the north rule: a code-file
firehose validated in-flight, violation rows appended to the sink, windowed
violation rates feeding alerting. ``trigger(availableNow=True)`` turns the
same query into a catch-up batch over a backlog — the streaming analog of
the pipeline's checkpoint resume (plus Spark's own checkpointLocation for
exactly-once sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yaschva_spark.engine import PASS_COL, VIOLATIONS_COL, validate_table


def read_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream (schema mandatory for streaming reads)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def validate_stream(stream_df: DataFrame, schema: dict, **kwargs) -> DataFrame:
    """Identical semantics to the batch ``validate_table`` — stateless, so
    it composes with any downstream streaming sink/agg."""
    return validate_table(stream_df, schema, **kwargs)


def windowed_violation_counts(
    validated: DataFrame,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time windowed violation counts by rule, watermark-bounded:
    (window, rule, n). Late rows beyond the watermark are dropped; state is
    evicted once the watermark passes the window end."""
    # watermarks require TIMESTAMP (tz-aware); NTZ sources are cast
    validated = validated.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    exploded = (
        validated.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.explode(VIOLATIONS_COL).alias("v"))
        .select(F.col(ts_col), F.col("v.rule").alias("rule"))
    )
    return exploded.groupBy(
        F.window(F.col(ts_col), window_duration).alias("window"), "rule"
    ).agg(F.count(F.lit(1)).alias("n"))


def windowed_pass_rate(
    validated: DataFrame,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """(window, n_rows, n_invalid, pass_rate) per event-time window."""
    validated = validated.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        validated.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("window"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col(PASS_COL)).cast("long")).alias("n_invalid"),
        )
        .withColumn("pass_rate", 1 - F.col("n_invalid") / F.col("n_rows"))
    )


def run_to_memory_sink(
    stream: DataFrame, query_name: str, output_mode: str = "append"
) -> "StreamingQuery":  # noqa: F821
    """Drain a stream with availableNow into an in-memory table (tests /
    backfills). Caller awaits termination and reads ``spark.table(name)``."""
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
