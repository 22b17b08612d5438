"""Structured Streaming: the compiled validator runs unchanged on a stream;
windowed violation aggregation matches the batch equivalent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yaschva_spark import streaming
from yaschva_spark.engine import PASS_COL, VIOLATIONS_COL, validate_table

SF = "/root/testdata/sf0.001"

EVENT_SCHEMA = {
    "event_id": "integer",
    "user_id": "integer",
    "event_type": {"$enum": ["click", "error", "purchase", "signup"]},  # 'view' missing on purpose
    "value": {"$number": {"min": 0, "max": 400}},
    "props": "string",
    "ts": "any",  # timestamps validate as 'any' (no date type in the schema language)
}


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # file stream sources need a directory; stage the single parquet file
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_stream_validation_matches_batch(spark, events_dir):
    batch = spark.read.parquet(f"{SF}/events.parquet")
    stream = streaming.read_stream(spark, events_dir, batch.schema)
    assert stream.isStreaming

    validated = streaming.validate_stream(stream, EVENT_SCHEMA)
    q = streaming.run_to_memory_sink(
        validated.select("event_id", PASS_COL, F.size(VIOLATIONS_COL).alias("nv")),
        "stream_validated",
    )
    q.awaitTermination(120)
    got = {r["event_id"]: (r[PASS_COL], r["nv"]) for r in spark.table("stream_validated").collect()}

    expected_df = validate_table(batch, EVENT_SCHEMA)
    exp = {
        r["event_id"]: (r[PASS_COL], len(r[VIOLATIONS_COL]))
        for r in expected_df.select("event_id", PASS_COL, VIOLATIONS_COL).collect()
    }
    assert got == exp
    assert any(not v[0] for v in got.values())  # 'view' events violate the enum


def test_windowed_violation_counts(spark, events_dir):
    batch = spark.read.parquet(f"{SF}/events.parquet")
    stream = streaming.read_stream(spark, events_dir, batch.schema)
    validated = streaming.validate_stream(stream, EVENT_SCHEMA)
    counts = streaming.windowed_violation_counts(validated, "ts", "1 hour", "2 hours")
    q = streaming.run_to_memory_sink(counts, "stream_counts", output_mode="complete")
    q.awaitTermination(120)
    got = spark.table("stream_counts").collect()
    assert len(got) > 0
    # cross-check totals against batch
    batch_total = (
        validate_table(batch, EVENT_SCHEMA)
        .select(F.explode(VIOLATIONS_COL).alias("v"))
        .count()
    )
    assert sum(r["n"] for r in got) == batch_total


def test_stateful_violation_totals_accumulates(spark, tmp_path):
    """applyInPandasWithState: totals accumulate across restarts via the
    checkpoint (two availableNow drains over a growing directory)."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    batch = spark.read.parquet(f"{SF}/events.parquet").limit(200)
    batch.write.mode("overwrite").parquet(str(src / "b1"))

    schema = spark.read.parquet(str(src / "b1")).schema

    sink = str(tmp_path / "sink")

    def drain(name):
        stream = streaming.read_stream(spark, str(src) + "/*", schema)
        validated = streaming.validate_stream(stream, EVENT_SCHEMA)
        totals = streaming.stateful_violation_totals(validated, key_col="event_type")
        q = (
            totals.writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(sink)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # latest emission per key = the running totals
        rows = spark.read.parquet(sink).collect()
        latest = {}
        for r in rows:
            if r["key"] not in latest or r["n_rows_total"] > latest[r["key"]]["n_rows_total"]:
                latest[r["key"]] = r
        return latest

    first = drain("stateful_1")
    assert sum(r["n_rows_total"] for r in first.values()) == 200

    # second batch arrives; state carries the first batch's totals
    batch.write.mode("overwrite").parquet(str(src / "b2"))
    second = drain("stateful_2")
    assert sum(r["n_rows_total"] for r in second.values()) == 400
    for k, r in second.items():
        assert r["n_rows_total"] == 2 * first[k]["n_rows_total"]
        assert r["n_violations_total"] == 2 * first[k]["n_violations_total"]
