"""Dump .explain("formatted") for round-16 optimization targets.

Writes plans/r16/<query>_<tag>.txt for each named query (default: every
queries() entry) at the bench scale factor, so before/after plan diffs
are reviewable without running Spark.

Usage:
    python scripts/dump_plans_r15.py before [q1,q2,...]
    python scripts/dump_plans_r15.py after  [q1,q2,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entrymod
from astro_vectordb_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = (
        {q.strip() for q in sys.argv[2].split(",") if q.strip()}
        if len(sys.argv) > 2
        else None
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = "/root/repo/plans/r16"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans-r16")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan.strip() + "\n")
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
