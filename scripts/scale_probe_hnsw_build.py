"""HNSW build-throughput probe at 500k / 1M rows (round-9 verdict
item 6): build was the weakest measured scale axis — SCALE_PROBE_HNSW
pins a full lifecycle at 200k x 64-d (8 shards) but never probed the
build past that, and build is the one stage whose cost grows with the
whole corpus, not the query.

What makes the build scale is that it is embarrassingly parallel in
SHARDS: ``auto_num_shards`` keeps every shard at ~``TARGET`` rows
(constant memory and constant per-shard wall time at any corpus
size), and a corpus 5x larger simply builds 5x the shards.  On a
fixed 32-core local box extra shards queue in WAVES of 32, so the
honest wall-time model is ``waves * per_shard_time`` — on a
1000-executor cluster the wave count collapses and wall time stays
flat.  This probe measures builds at 200k / 500k / 1M and asserts:

  B1  shard-memory flat: at every scale the LARGEST shard holds
      <= 1.3 x TARGET rows (auto_num_shards + hash routing), so the
      per-task build memory envelope does not grow with the corpus;
  B2  per-wave wall time near-linear: build_time / ceil(shards/32)
      at 500k and 1M within 1.6x of the 200k reference — per-shard
      cost is corpus-size-independent;
  B3  the saved index at 1M really has ceil(1M/25k) = 40 shard
      partitions (the parallelism a cluster would exploit).

Emits ONE JSON line (and --out file).  Not part of the driver bench;
evidence for ARCHITECTURE.md's build-scaling claim.

Usage: python scripts/scale_probe_hnsw_build.py [--out SCALE_PROBE_HNSW_BUILD.json]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from astro_vectordb_spark.session import get_spark

DIM = 64
TARGET = 25_000
SCALES = [200_000, 500_000, 1_000_000]
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_T0 = time.time()


def log(msg: str) -> None:
    print(f"[probe +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def synth_corpus(spark, n_rows: int, path: str):
    """Deterministic pseudo-random corpus (same xxhash64 construction
    as scale_probe_hnsw.synth_corpus): JVM-side codegen, no Python in
    the generation path, stable across runs."""
    coords = [
        (
            (F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(1_000_000))
             / 1_000_000.0) - F.lit(0.5)
        ).cast("float")
        for i in range(DIM)
    ]
    df = spark.range(n_rows).select(
        F.col("id").alias("vec_id"), F.array(*coords).alias("embedding")
    )
    df.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    spark = get_spark("scale-probe-hnsw-build")
    spark.sparkContext.setLogLevel("ERROR")

    from astro_vectordb_spark.operators.hnsw import (
        auto_num_shards,
        hnsw_build_shards,
    )
    from astro_vectordb_spark.sources.vault import save_hnsw_index

    rows_out: list[dict] = []
    for n in SCALES:
        corpus_path = f"/tmp/scale/hnsw_build_corpus_{n}"
        index_path = f"/tmp/scale/hnsw_build_index_{n}"
        log(f"synthesizing {n} rows")
        corpus = synth_corpus(spark, n, corpus_path)
        shards = auto_num_shards(n, target_rows_per_shard=TARGET)
        waves = math.ceil(shards / CORES)
        log(f"building {shards} shards ({waves} wave(s) on {CORES} cores)")
        t0 = time.time()
        graph = hnsw_build_shards(
            corpus, num_shards=shards, m=16, ef_construction=64,
            metric="cosine",
        )
        save_hnsw_index(graph, index_path, m=16, metric="cosine")
        build_sec = round(time.time() - t0, 2)
        shard_counts = (
            spark.read.parquet(os.path.join(index_path, "graph"))
            .groupBy("shard_id").count()
        )
        agg = shard_counts.agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.max("count").alias("max_rows"),
            F.min("count").alias("min_rows"),
        ).first()
        rows_out.append(
            {
                "n_rows": n,
                "num_shards": shards,
                "waves": waves,
                "build_save_sec": build_sec,
                "per_wave_sec": round(build_sec / waves, 2),
                "rows_per_sec": round(n / build_sec, 1),
                "n_shards_on_disk": agg["n_shards"],
                "max_shard_rows": agg["max_rows"],
                "min_shard_rows": agg["min_rows"],
            }
        )
        log(f"{n}: {build_sec}s build+save, max shard "
            f"{agg['max_rows']} rows")
        shutil.rmtree(corpus_path, ignore_errors=True)
        shutil.rmtree(index_path, ignore_errors=True)

    ref = rows_out[0]
    checks = {
        "B1_shard_rows_flat": all(
            r["max_shard_rows"] <= 1.3 * TARGET for r in rows_out
        ),
        "B2_per_wave_near_linear": all(
            r["per_wave_sec"] <= 1.6 * ref["per_wave_sec"]
            for r in rows_out[1:]
        ),
        "B3_shard_count_scales": all(
            r["n_shards_on_disk"] == math.ceil(r["n_rows"] / TARGET)
            for r in rows_out
        ),
    }
    res = {
        "dim": DIM,
        "target_rows_per_shard": TARGET,
        "cores": CORES,
        "scales": rows_out,
        "checks": checks,
        "all_green": all(checks.values()),
    }
    line = json.dumps(res)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
