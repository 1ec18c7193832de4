"""Round-15 instrumented measurement: per-query job/stage breakdown.

Runs named queries() entries exactly like bench.py (cold pass, then a
timed warm pass with the noop sink), with the Spark UI enabled, and
reports per query:

- wall seconds (warm)
- number of jobs and stages the query executed
- total task time, executor run time, shuffle read/write bytes,
  python-eval presence (from the REST status API)

Usage:
    python scripts/measure_r15.py q1,q2,...   [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

# resolve the ENCLOSING tree (not a hardcoded path): running the copy
# inside an A/B worktree must measure THAT worktree's engine
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entrymod
from astro_vectordb_spark.session import get_spark


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    names = [q for q in sys.argv[1].split(",") if q] if len(sys.argv) > 1 else []
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "measure-r15", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy(F.col("id") % 7).count().write.format(
        "noop"
    ).mode("overwrite").save()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").write.format(
        "noop"
    ).mode("overwrite").save()
    entrymod.hnsw_index_path(spark, sf_dir)
    entrymod.ivf_index_path(spark, sf_dir)
    entrymod.pq_index_path(spark, sf_dir)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"

    qs = entrymod.queries()
    all_names = names or list(qs)
    out = {}
    for name in all_names:
        fn = qs[name]
        # cold pass (JIT/plan warm)
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: COLD FAIL {e}", file=sys.stderr)
            continue
        jobs_before = {j["jobId"] for j in _rest(base, "/jobs")}
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        wall = min(walls)
        jobs = [j for j in _rest(base, "/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in _rest(base, f"/stages/{sid}"):
                    stages.append(att)
            except Exception:  # noqa: BLE001
                pass
        n_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
        exec_run = sum(s.get("executorRunTime", 0) for s in stages) / 1e3
        cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
        sh_r = sum(s.get("shuffleReadBytes", 0) for s in stages)
        sh_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        fetch = sum(s.get("shuffleFetchWaitTime", 0) for s in stages) / 1e3
        sched = sum(
            max(
                0.0,
                (s.get("executorDeserializeTime", 0)) / 1e3,
            )
            for s in stages
        )
        rec = {
            "wall_s": round(wall, 3),
            "walls": [round(w, 3) for w in walls],
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "n_tasks": n_tasks,
            "task_run_s": round(exec_run, 2),
            "task_cpu_s": round(cpu, 2),
            "deser_s": round(sched, 2),
            "fetch_wait_s": round(fetch, 2),
            "shuffle_read_mb": round(sh_r / 1e6, 2),
            "shuffle_write_mb": round(sh_w / 1e6, 2),
        }
        out[name] = rec
        print(name, json.dumps(rec))
    print("== summary by wall ==")
    for name, rec in sorted(out.items(), key=lambda kv: -kv[1]["wall_s"]):
        print(
            f"{rec['wall_s']:7.2f}s jobs={rec['n_jobs']:3d} "
            f"stages={rec['n_stages']:3d} tasks={rec['n_tasks']:4d} "
            f"run={rec['task_run_s']:7.1f}s shr={rec['shuffle_read_mb']:6.1f}MB "
            f"{name}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
