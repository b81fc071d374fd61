"""Catalog-wide oracle/engine TYPE parity guard.

The local value-hash gate str()-normalizes cells, so DuckDB type promotion
(integer sum() -> HUGEINT, row_number -> BIGINT vs Spark int, bit_count ->
TINYINT) is invisible locally but is exactly the surface where the DRIVER's
comparator diverged in round 2 (host_degrees). This test runs every oracle
SQL LIMIT 0 against every Spark query schema at sf0.001 and fails on any
column whose DuckDB type is not the canonical match for the Spark type —
new catalog entries cannot reintroduce the drift."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_all_oracle_types_match_spark(spark):
    from type_audit import TABLES, _spark_ok
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = E.queries(), E.oracle_sql()
    flagged = []
    for name, fn in qs.items():
        sql = oracles.get(name)
        if sql is None:
            continue
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        duck = dict(zip(rel.columns, [str(t) for t in rel.types]))
        spark_types = {f.name: f.dataType.simpleString()
                       for f in fn(spark, SF_DIR).schema.fields}
        for col, st in spark_types.items():
            dt = duck.get(col)
            if dt is None:
                flagged.append(f"{name}.{col}: missing in oracle")
            elif not _spark_ok(st, dt):
                flagged.append(f"{name}.{col}: spark={st} duckdb={dt}")
    assert not flagged, "\n".join(flagged)
