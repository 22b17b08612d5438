"""io seam: quarantined ingestion (schema-enforced json/csv with
corrupt-row split). The bucketed-write contract lives in test_plans.py."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from yaschva_spark.io import read_quarantined

SF = "/root/testdata/sf0.001"

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_json_quarantine_splits_losslessly(spark, tmp_path):
    p = tmp_path / "in.json"
    lines = [
        '{"doc_id": 1, "lang": "en"}',
        "{this is not json",
        '{"doc_id": 2, "lang": "fr"}',
        ",,,",
        '{"doc_id": 3}',  # missing field parses clean -> NULL lang, NOT corrupt
    ]
    p.write_text("\n".join(lines) + "\n")
    good, bad = read_quarantined(spark, str(p), SCHEMA, fmt="json")
    g = {(r["doc_id"], r["lang"]) for r in good.collect()}
    assert g == {(1, "en"), (2, "fr"), (3, None)}
    assert good.columns == ["doc_id", "lang"]  # corrupt column never leaks
    b = sorted(r["raw"] for r in bad.collect())
    assert b == [",,,", "{this is not json"]  # raw lines kept byte-for-byte
    assert all(r["source_file"].endswith("in.json") for r in bad.collect())
    # the pruning trap: a bare count() over the quarantine side must stay
    # legal (QUERY_ONLY_CORRUPT_RECORD_COLUMN would fire if quarantine
    # were a filter over the permissive relation)
    assert bad.count() == 2 and good.count() == 3


def test_csv_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("1,en\nnot_a_long,xx\n2,fr\n")
    good, bad = read_quarantined(spark, str(p), SCHEMA, fmt="csv")
    assert {(r["doc_id"], r["lang"]) for r in good.collect()} == {(1, "en"), (2, "fr")}
    assert [r["raw"] for r in bad.collect()] == ["not_a_long,xx"]


def test_quarantine_rejects_colliding_schema(spark):
    with pytest.raises(ValueError):
        read_quarantined(
            spark,
            "/nonexistent",
            T.StructType([T.StructField("_corrupt_record", T.StringType())]),
        )
