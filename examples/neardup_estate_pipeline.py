"""Near-dup ESTATE maintenance pipeline (round 14): one handle per
index, four blocking families, the same lifecycle verbs everywhere.

A 100 TB training-data pipeline ends up with several persisted dedup
indexes — MinHash over raw text, SimHash for a cheaper second opinion,
RP-LSH over embeddings, SemDeDup centroid cells for semantic near-dups.
``neardup.open`` detects the family from each index's own ``_meta``,
so the maintenance loop below doesn't know (or care) which is which:

  open -> match the day's batch -> append the novel rows (replay-safe)
  -> watch the SemDeDup drift report -> refresh when it sinks ->
  periodic sweep-apply + compact + replay-log gc.

Run: python examples/neardup_estate_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from astro_vectordb_spark import neardup
from astro_vectordb_spark.session import get_spark
from astro_vectordb_spark.sources.semdedup_index import save_semdedup_index
from astro_vectordb_spark.sources.vault import (
    save_minhash_index,
    save_rp_index,
    save_simhash_index,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("neardup-estate", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    hist_docs = docs.filter(F.col("doc_id") % 5 != 4)
    hist_emb = emb.filter(F.col("vec_id") % 5 != 4)

    # ------------------------------------------------------------------
    # Build the estate once (each family's save_* face; in production
    # these run at ingest, not per maintenance cycle).
    root = tempfile.mkdtemp(prefix="nd_estate_")
    save_minhash_index(hist_docs, f"{root}/minhash")
    save_simhash_index(hist_docs, f"{root}/simhash", max_hamming=3)
    save_rp_index(hist_emb, f"{root}/rp")
    save_semdedup_index(hist_emb, f"{root}/semdedup", k_cells=16)

    # ------------------------------------------------------------------
    # The daily loop: ONE code path for all four families.
    new_docs = docs.filter(F.col("doc_id") % 5 == 4)
    new_emb = emb.filter(F.col("vec_id") % 5 == 4)
    for path in (f"{root}/minhash", f"{root}/simhash", f"{root}/rp",
                 f"{root}/semdedup"):
        idx = neardup.open(spark, path)
        batch = new_docs if idx.family in ("minhash", "simhash") else new_emb
        n_pairs = idx.match(batch).count()
        rep = idx.append(batch, batch_id=1)
        print(f"[{idx.family}] matched {n_pairs} batch-vs-history pairs; "
              f"appended {rep['appended_rows']} novel rows")
        # SemDeDup appends carry the drift report: batch similarity to
        # the frozen centroids vs the train-time baseline.
        if idx.family == "semdedup":
            drift = rep["train_sim_mean"] - rep["batch_sim_mean"]
            print(f"[semdedup] drift report: batch {rep['batch_sim_mean']:.3f}"
                  f" vs baseline {rep['train_sim_mean']:.3f}")
            if drift > 0.1:  # policy threshold: retrain in place
                rrep = idx.refresh(k_cells=16)
                print(f"[semdedup] refreshed: {rrep['moved_rows']} rows "
                      f"moved cells, new baseline "
                      f"{rrep['train_sim_mean']:.3f} (vectors untouched)")
        # periodic maintenance — same verbs per family
        swept = idx.apply_sweep(batch_id=2)
        idx.compact()
        idx.gc(keep_last_batches=8)
        print(f"[{idx.family}] sweep kept {swept['kept']} rows; "
              f"compaction + replay-log gc done")

    print("estate maintained: four families, one loop")


if __name__ == "__main__":
    main()
