"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and the
matching ``oracle_sql()`` on DuckDB over the same parquet tables, then
compares row count, column names, and order-insensitive values (columns
sorted by name, rows sorted, floats compared exactly and with 1e-9
relative tolerance so we can spot borderline float drift before the
driver does).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry_mod
from lrmr_spark.session import get_spark
from lrmr_spark.tables import TABLES


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sortkey(row):
    return tuple((x is None, str(x)) for x in row)


def _eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(_eq(x, y) for x, y in zip(a, b))
    return a == b


def compare(name: str, spark, con) -> dict:
    t0 = time.time()
    q = entry_mod.queries()[name]
    sdf = q(spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = [tuple(_norm(r[c]) for c in scols) for r in sdf.collect()]
    t_spark = time.time() - t0

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        return {"name": name, "status": "rows-only", "rows": len(srows), "sec": round(t_spark, 2)}

    t0 = time.time()
    res = con.execute(sql)
    ocols_raw = [d[0] for d in res.description]
    orows_raw = res.fetchall()
    order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    ocols = [ocols_raw[i] for i in order]
    orows = [tuple(_norm(r[i]) for i in order) for r in orows_raw]
    t_duck = time.time() - t0

    out = {"name": name, "rows": len(srows), "sec": round(t_spark, 2), "oracle_sec": round(t_duck, 2)}
    if scols != ocols:
        out["status"] = "SCHEMA-MISMATCH"
        out["spark_cols"] = scols
        out["oracle_cols"] = ocols
        return out
    if len(srows) != len(orows):
        out["status"] = "ROWCOUNT-MISMATCH"
        out["oracle_rows"] = len(orows)
        return out
    srows.sort(key=_sortkey)
    orows.sort(key=_sortkey)
    exact = srows == orows
    n_bad = 0
    first_bad = None
    for a, b in zip(srows, orows):
        if not _eq(a, b):
            n_bad += 1
            if first_bad is None:
                first_bad = (a, b)
    if n_bad:
        out["status"] = "VALUE-MISMATCH"
        out["bad_rows"] = n_bad
        out["example"] = repr(first_bad)
    else:
        out["status"] = "OK" if exact else "OK-tol"  # OK-tol: equal only under float tolerance
    return out


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    names = [n for n in entry_mod.queries() if not only or n in only]
    failed = 0
    for n in names:
        try:
            r = compare(n, spark, con)
        except Exception as e:
            r = {"name": n, "status": "ERROR", "error": str(e)[:500]}
        ok = r["status"] in ("OK", "OK-tol", "rows-only")
        failed += 0 if ok else 1
        print(("PASS " if ok else "FAIL ") + str(r), flush=True)
    print(f"\n{len(names) - failed}/{len(names)} passed")
    sys.exit(1 if failed else 0)
