#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate — driver-canon aligned.

Runs every ``queries()`` entry on Spark AND its ``oracle_sql()`` on
DuckDB at the given sf dir, compares row-count, sorted-by-name schema,
and a value hash. Canonicalization mirrors the driver's pandas-based
hasher (the round-4 lesson: the old ``fetchall()`` + ``%.6g`` gate was
provably looser and let four typing defects ship):

* BOTH sides are fetched as pandas — Spark via Arrow ``toPandas()``,
  DuckDB via ``.df()`` (so HUGEINT→float64 coercion is visible, exactly
  as the driver sees it).
* Values are stringified at FULL precision per dtype: ``repr(float)``
  (keeps ``-0.0`` distinct from ``0.0`` and ``7.0`` distinct from
  int ``7``), ``str(int)``, timestamps unit-normalized to ISO strings.
* A per-column dtype-KIND mismatch (int64 vs float64, bool vs int) is
  a hard FAIL even when the stringified multisets would happen to
  collide. Datetime STORAGE units are deliberately one kind (Spark ns
  vs DuckDB us for identical values — the driver accepts the pairing);
  values still compare at full ISO precision.
* Any contract row whose output contains array/map/struct/binary (on
  the Spark schema OR as list/bytes/ndarray cells in either pandas
  frame) is a hard FAIL — the driver's canonicalizer crashes on them
  (r4 ``m_byte_hist``), so they must never reach it.

Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

from graphblast_spark.contract import compare, spark_schema_violations  # noqa: E402

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
            bad_types = spark_schema_violations(sdf)
            if bad_types:
                print(f"FAIL  {name}: non-scalar output columns {bad_types} "
                      "(driver canon crashes on array/map/struct/binary)")
                n_fail += 1
                continue
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            ok, detail = compare(spdf, opdf)
        except ValueError as e:
            ok, detail = False, f" {e}"
        status = "ok" if ok else "FAIL"
        print(f"{status:5s} {name}: rows={len(spdf)}{detail} [{time.time()-t0:.1f}s]")
        if ok:
            n_pass += 1
        else:
            n_fail += 1
    print(f"\nSUMMARY pass={n_pass} weak={n_weak} fail={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
