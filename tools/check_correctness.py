"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row count, schema and (order-insensitively)
values. Stricter than a hash: exact cell equality after sorting, with a
max-float-diff report when cells differ, so float-precision risk is
visible before the driver sees it.

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    only = set(sys.argv[1:])
    # A deliberately STOCK session (no sifts_spark.session.get_spark):
    # the driver's harness builds its own vanilla SparkSession, so any
    # catalog entry that silently depends on our factory's defaults
    # (timezone, inferTimestampNTZ, Arrow, broadcast threshold) must
    # fail HERE, before the driver sees it. r03 regression proof: the
    # events NTZ fix lived in get_spark and the driver never ran it.
    # Unconditional PREPEND (setdefault is a no-op when PYTHONPATH is
    # already set, and Python-UDF workers inherit this env var to find
    # sifts_spark — the driver interpreter's sys.path doesn't reach them)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    spark = (
        SparkSession.builder.appName("correctness-vanilla")
        .master("local[8]")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        finally:
            # the operator-persist contract (caching.py): rows like
            # fts_phrase/fts_bm25 track() an in-query postings build;
            # without a per-query release each stays pinned in executor
            # memory for the remaining ~50 queries of this run
            from sifts_spark.caching import release_all

            release_all()
        if name not in oracles:
            print(f"OK?  {name}: rows={len(sdf)} (no oracle — rows-only check) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            continue
        ok, msg = compare(sdf, odf)
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: {msg} [{time.time()-t0:.1f}s]")
        if not ok:
            failures.append(name)
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall green")
    return 0


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, str]:
    if len(sdf) != len(odf):
        return False, f"row count {len(sdf)} != {len(odf)}"
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return False, f"columns {scols} != {ocols}"
    s = sdf[scols].sort_values(by=scols).reset_index(drop=True)
    o = odf[scols].sort_values(by=scols).reset_index(drop=True)
    max_float_diff = 0.0
    for c in scols:
        sv, ov = s[c], o[c]
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            sa = sv.astype(float).to_numpy()
            oa = ov.astype(float).to_numpy()
            both_nan = np.isnan(sa) & np.isnan(oa)
            eq = (sa == oa) | both_nan
            if not eq.all():
                d = np.nanmax(np.abs(sa - oa))
                return False, f"col {c}: {int((~eq).sum())} cells differ, max diff {d:.3e}"
        elif np.issubdtype(sv.dtype, np.datetime64) or np.issubdtype(
            ov.dtype, np.datetime64
        ):
            st, ot = pd.to_datetime(sv), pd.to_datetime(ov)
            eq = (st == ot) | (st.isna() & ot.isna())
            if not eq.all():
                return False, f"col {c}: {int((~eq).sum())} timestamp cells differ"
        else:
            if not (sv.astype(str) == ov.astype(str)).all():
                bad = (sv.astype(str) != ov.astype(str)).sum()
                return False, f"col {c}: {bad} cells differ"
    return True, f"rows={len(sdf)} max_float_diff={max_float_diff:.1e}"


if __name__ == "__main__":
    sys.exit(main())
