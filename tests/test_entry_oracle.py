"""Mimic the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() on DuckDB at sf0.01; row counts, column names, and
(order-insensitive) values must match."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(rows, columns):
    """Dtype-strict normalization: floats and ints are kept distinct (tagged
    by kind) so a DuckDB HUGEINT->float64 leak (13623.0 vs Spark's 13623)
    fails HERE, like the driver's value hash, not only in CORRECTNESS_rN."""
    import numpy as np

    out = []
    for row in rows:
        vals = []
        for c in columns:
            v = row[c] if not isinstance(row, tuple) else row[columns.index(c)]
            if v is None:
                # SQL NULL: Spark collects Python None while pandas folds a
                # DuckDB NULL double to NaN — sentinel BOTH to one tag so
                # the two spellings of "missing" compare equal
                vals.append(("nul", None))
            elif isinstance(v, (bool, np.bool_)):
                vals.append(("b", bool(v)))
            elif isinstance(v, (float, np.floating)):
                fv = float(v)
                vals.append(("nul", None) if math.isnan(fv) else ("f", round(fv, 6)))
            elif isinstance(v, (int, np.integer)):
                vals.append(("i", int(v)))
            else:
                vals.append(("o", v))
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    o = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    cols = sorted(sdf.columns)
    spark_rows = [r.asDict() for r in sdf.collect()]
    got = _normalize(spark_rows, cols)
    # every query MUST ship an oracle: a missing/typo'd oracle_sql() entry
    # previously fell into a vacuous rows-only branch and green-lit an
    # unvalidated query (intentional rows-only queries would be listed in
    # an explicit allowlist here — there are none)
    assert o is not None, f"{name}: no oracle_sql() entry"
    odf = ddb.sql(o).df()
    assert sorted(odf.columns.tolist()) == cols, (sorted(odf.columns.tolist()), cols)
    exp = _normalize([tuple(rec[c] for c in cols) for rec in odf.to_dict("records")], cols)
    assert len(got) == len(exp), f"{name}: {len(got)} spark rows vs {len(exp)} oracle rows"
    assert got == exp, f"{name}: first diff {next(((a, b) for a, b in zip(got, exp) if a != b), None)}"


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"doc_id", "path", "rule", "error", "value"} <= set(df.columns)
