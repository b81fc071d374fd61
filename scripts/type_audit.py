"""Audit oracle-vs-Spark result TYPES for every catalog query.

The driver's correctness gate compares cell values after its own
normalization; DuckDB type promotion (integer sum() -> HUGEINT, decimal
arithmetic widening) is invisible to the repo's str()-based local gate but
is exactly the surface where a different DuckDB/pandas version can format a
cell differently (VERDICT r02: host_degrees). This script runs each oracle
SQL (LIMIT 0 — types only, no data) and each Spark query schema, then
reports any column whose DuckDB type is not the canonical match for the
Spark type. Fix = explicit casts in the oracle SQL.

Usage: python scripts/type_audit.py [sf_dir] [only ...]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# spark simpleString -> acceptable duckdb type names (upper)
OK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT", "DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "binary": {"BLOB"},
}


def _spark_ok(spark_t, duck_t):
    duck_t = duck_t.upper()
    if spark_t.startswith("array<") or spark_t.startswith("struct<") or \
            spark_t.startswith("map<"):
        return duck_t.endswith("[]") or duck_t.startswith("STRUCT") or \
            duck_t.startswith("MAP")
    if spark_t.startswith("decimal"):
        return duck_t.startswith("DECIMAL")
    return duck_t in OK.get(spark_t, {duck_t})


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb
    import __spark_entry__ as E
    from abot_dotnet_core_spark.session import get_spark

    spark = get_spark("type_audit", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    n_flagged = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            duck = dict(zip(rel.columns, [str(t) for t in rel.types]))
            sdf = fn(spark, sf_dir)
            spark_types = {f.name: f.dataType.simpleString()
                           for f in sdf.schema.fields}
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {exc}")
            n_flagged += 1
            continue
        for col, st in spark_types.items():
            dt = duck.get(col)
            if dt is None:
                print(f"MISS {name}.{col}: not in oracle output")
                n_flagged += 1
            elif not _spark_ok(st, dt):
                print(f"TYPE {name}.{col}: spark={st} duckdb={dt}")
                n_flagged += 1
    print(f"flagged: {n_flagged}")
    return 1 if n_flagged else 0


if __name__ == "__main__":
    sys.exit(main())
