"""Local mirror of the driver's correctness gate: run every queries() entry
in Spark AND its oracle_sql() in DuckDB at sf0.01, compare row count + column
names + order-insensitive values (sorted columns, normalized formatting)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".") or "0"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out)


ORACLE = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLE[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}")
    s_norm = _normalize(s_rows, s_cols)
    d_norm = _normalize(d_rows, d_cols)
    mism = [i for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b][:5]
    assert s_norm == d_norm, (
        f"{name}: value mismatch at {mism};"
        f" spark={[s_norm[i] for i in mism[:2]]}"
        f" oracle={[d_norm[i] for i in mism[:2]]}")


def test_rows_only_queries_run(spark):
    """Entries without an oracle still must run and return a stable schema."""
    for name in sorted(set(QUERIES) - set(ORACLE)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
