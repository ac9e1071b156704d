"""Local twin of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin over the same parquet dir, compare
row-count + column names + order-insensitive values."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

import __spark_entry__ as E

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    # Type-sensitive for numbers: the driver hashes values with their
    # dtype, so an int64 9707 vs a float64 9707.0 (e.g. DuckDB HUGEINT
    # sum landing as float) MUST mismatch here too — tagging floats
    # keeps this twin predictive of the driver, where a plain round()
    # would let int == float slip through.
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return ("f", round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("f", round(float(v), 9))
    except ImportError:
        pass
    return v


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


ORACLE = E.oracle_sql()
QUERIES = E.queries()


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    qdf = QUERIES[name](spark, sf_dir)
    spark_cols = [c.lower() for c in qdf.columns]
    spark_rows = [tuple(r) for r in qdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(ORACLE[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row counts differ"
    ms, md = _rows_to_multiset(spark_cols, spark_rows), _rows_to_multiset(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(ms, md) if a != b][:5]
    assert ms == md, f"{name}: values differ, first mismatches: {mismatches}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", ["q_crawl_epoch", "q_image_decode", "q_crawl_curate"])
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    if name == "q_image_decode":
        assert all(r.phash_ok == 1 for r in rows)
