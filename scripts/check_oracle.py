"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares it to the
matching ``oracle_sql()`` via DuckDB: row-count, schema (sorted column
names), and order-insensitive exact value comparison.  Reports per-query
PASS/FAIL plus max float deviation on mismatch so rounding issues are
diagnosable before the real driver runs.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from astro_vectordb_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(spark_pdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        a, b = canon(spark_pdf), canon(duck_pdf)
        status, detail = "PASS", ""
        if list(a.columns) != list(b.columns):
            status, detail = "FAIL", f"columns {list(a.columns)} vs {list(b.columns)}"
        elif len(a) != len(b):
            status, detail = "FAIL", f"rows {len(a)} vs {len(b)}"
        else:
            for c in a.columns:
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                if np.issubdtype(av.dtype, np.floating) or np.issubdtype(
                    bv.dtype, np.floating
                ):
                    av = av.astype(np.float64)
                    bv = bv.astype(np.float64)
                    # bitwise compare: sign-of-zero-sensitive (the
                    # driver hashes string forms, where -0.0 != 0.0;
                    # np.array_equal would silently pass that case)
                    if not np.array_equal(
                        av.view(np.int64), bv.view(np.int64)
                    ):
                        status = "FAIL"
                        detail += (
                            f" col {c} max|Δ|="
                            f"{np.nanmax(np.abs(av - bv)):.3e}"
                        )
                elif not (av == bv).all():
                    status = "FAIL"
                    detail += f" col {c} value mismatch"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: {len(a)} rows, {time.time()-t0:.1f}s {detail}")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
