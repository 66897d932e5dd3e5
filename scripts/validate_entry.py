"""Local replica of the driver's correctness gate: run every queries() entry
on Spark at sf0.01 and its oracle_sql() in DuckDB on the same parquet, then
compare row count, sorted column names, and an order-insensitive value
multiset. Usage: python scripts/validate_entry.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from boris_spark.engine.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    names = sys.argv[1:]
    json_path = None
    if "--json" in names:
        i = names.index("--json")
        json_path = names[i + 1]
        del names[i : i + 2]
    results: dict[str, dict] = {}
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    if not names:
        names = list(qs)
    spark = get_spark("validate", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None, "oracle_rows": None,
                "err": f"spark error: {type(e).__name__}: {e}",
            }
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in sqls:
            results[name] = {
                "rows_match": True, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": None, "rows_only": True,
            }
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(sqls[name])
            dcols = [c for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None,
                "err": f"duckdb error: {type(e).__name__}: {e}",
            }
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        status = []
        rows_match = len(srows) == len(drows)
        schema_match = sorted(scols) == sorted(dcols)
        hash_match = None
        if not rows_match:
            status.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not schema_match:
            status.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
        if not status:
            a = norm_rows(scols, [tuple(r) for r in srows])
            b = norm_rows(dcols, drows)
            hash_match = a == b
            if not hash_match:
                diff = [
                    (x, y) for x, y in zip(a, b) if x != y
                ][:3]
                status.append(f"values differ, first diffs: {diff}")
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": "; ".join(status) or None,
        }
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(names)-len(failures)}/{len(names)} passed")
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(results, fh, indent=2)
        print(f"wrote {json_path} ({len(results)} gates)")
    from boris_spark.ops.queries import release_persisted

    release_persisted()
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
