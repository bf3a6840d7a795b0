#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark AND its ``oracle_sql()`` on
DuckDB at the given sf dir, compares row-count, sorted-by-name schema,
and a value hash (values stringified, rows sorted). Prints one line per
query plus a summary. Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import math

    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def df_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    import duckdb
    import __spark_entry__ as em
    from graphblast_spark import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = em.queries(), em.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            orel = con.execute(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        sh = df_hash(scols, [[r[c] for c in scols] for r in srows])
        oh = df_hash(ocols, orows)
        ok_hash = sh == oh
        status = "ok" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        detail = ""
        if not ok_rows:
            detail += f" rows {len(srows)}!={len(orows)}"
        if not ok_schema:
            detail += f" schema {sorted(scols)}!={sorted(ocols)}"
        if ok_rows and ok_schema and not ok_hash:
            detail += f" hash {sh}!={oh}"
        print(f"{status:5s} {name}: rows={len(srows)}{detail} [{time.time()-t0:.1f}s]")
        if status == "ok":
            n_pass += 1
        else:
            n_fail += 1
    print(f"\nSUMMARY pass={n_pass} weak={n_weak} fail={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
