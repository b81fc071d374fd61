"""Local mirror of the driver's DuckDB correctness gate.

For every entry in ``__spark_entry__.queries()``: run the Spark query and
the DuckDB oracle SQL side-by-side on the same parquet tables, then compare
row count, column-name set, and an order-insensitive value hash (columns
sorted by name, rows sorted, values normalized to strings the same way for
both engines). Usage::

    python scripts/oracle_check.py [sf_dir] [only_query ...]

Defaults to /root/testdata/sf0.01. Exit code 1 if any query mismatches.
"""

import hashlib
import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 6))
    if isinstance(v, Decimal):
        f = float(v)
        return repr(round(f, 6))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import __spark_entry__ as E
    from abot_dotnet_core_spark.session import get_spark

    spark = get_spark("oracle_check", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    bad = []
    artifact = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            bad.append(name)
            print(f"FAIL  {name}: spark raised {ex!r:.300}")
            artifact[name] = {"rows_match": False, "schema_match": False,
                              "hash_match": False, "err": repr(ex)[:300]}
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"warn  {name}: no oracle ({len(s_rows)} spark rows)")
            artifact[name] = {"rows_match": len(s_rows) >= 0,
                              "schema_match": None, "hash_match": None,
                              "spark_rows": len(s_rows), "oracle_rows": None,
                              "err": None}
            continue
        try:
            cur = con.execute(sql)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as ex:  # noqa: BLE001
            bad.append(name)
            print(f"FAIL  {name}: duckdb raised {ex!r:.300}")
            artifact[name] = {"rows_match": False, "schema_match": False,
                              "hash_match": False, "err": repr(ex)[:300]}
            continue
        rows_ok = len(s_rows) == len(o_rows)
        schema_ok = sorted(s_cols) == sorted(o_cols)
        hash_ok = (schema_ok and rows_ok
                   and _value_hash(s_cols, s_rows) == _value_hash(o_cols,
                                                                  o_rows))
        artifact[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                          "hash_match": hash_ok, "spark_rows": len(s_rows),
                          "oracle_rows": len(o_rows), "err": None}
        if rows_ok and schema_ok and hash_ok:
            print(f"ok    {name} ({len(s_rows)} rows)")
        else:
            bad.append(name)
            print(f"FAIL  {name}: rows {len(s_rows)}/{len(o_rows)} "
                  f"schema_ok={schema_ok} hash_ok={hash_ok}")
            if schema_ok and rows_ok:
                order = sorted(range(len(s_cols)),
                               key=lambda i: s_cols[i])
                s_set = {"\x1f".join(_norm_cell(r[i]) for i in order)
                         for r in s_rows}
                oorder = sorted(range(len(o_cols)),
                                key=lambda i: o_cols[i])
                o_set = {"\x1f".join(_norm_cell(r[i]) for i in oorder)
                         for r in o_rows}
                for ln in sorted(s_set - o_set)[:3]:
                    print(f"        spark-only: {ln[:200]}")
                for ln in sorted(o_set - s_set)[:3]:
                    print(f"        oracle-only: {ln[:200]}")
    out = os.environ.get("ORACLE_CHECK_JSON")
    if out:
        import json
        with open(out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"artifact -> {out} ({len(artifact)} queries)")
    print(f"\n{len(bad)} mismatching queries" + (f": {bad}" if bad else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
