"""Retrieval-index ESTATE maintenance pipeline (round 15): one handle
per index, five physical kinds, the same lifecycle verbs everywhere.

A serving deployment ends up with several persisted retrieval indexes —
an IVF table for exact bound-pruned search, a sharded HNSW graph for
low-latency ANN, PQ/IVF-PQ codes for compressed scans, a BM25 index
for the lexical leg.  ``index.open`` detects the kind from each
index's own on-disk layout, so the maintenance loop below doesn't know
(or care) which is which:

  open -> append the day's batch (replay-safe where the kind logs) ->
  watch the PQ kinds' batch-MSE drift report -> refresh codebooks in
  place when it climbs -> HNSW health check + rebalance -> compaction
  + replay-log gc -> serve one query through every handle.

Run: python examples/index_maintenance_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from astro_vectordb_spark import index
from astro_vectordb_spark.operators.ann import ivf_build
from astro_vectordb_spark.operators.hnsw import hnsw_build_shards
from astro_vectordb_spark.operators.keyword import bm25_term_stats
from astro_vectordb_spark.operators.pq import (
    ivf_pq_build,
    pq_encode,
    pq_train,
)
from astro_vectordb_spark.session import get_spark
from astro_vectordb_spark.sources.vault import (
    save_bm25_index,
    save_hnsw_index,
    save_ivf_index,
    save_ivf_pq_index,
    save_pq_index,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("index-estate", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    hist = emb.filter(F.col("vec_id") % 5 != 4).cache()
    batch = emb.filter(F.col("vec_id") % 5 == 4)

    # ------------------------------------------------------------------
    # Build the estate once (each kind's build + save faces; in
    # production these run at ingest, not per maintenance cycle).
    root = tempfile.mkdtemp(prefix="idx_estate_")
    assigned, cents = ivf_build(hist, k_cells=8)
    save_ivf_index(assigned, cents, f"{root}/ivf")
    graph = hnsw_build_shards(hist, num_shards=2, ef_construction=40)
    save_hnsw_index(graph, f"{root}/hnsw", m=16, metric="cosine")
    model = pq_train(hist, m=8, ks=32)
    save_pq_index(pq_encode(hist, model), model, f"{root}/pq")
    enc, pcents, pmodel = ivf_pq_build(hist, k_cells=8, m=8, ks=32)
    save_ivf_pq_index(enc, pcents, pmodel, f"{root}/ivfpq")
    ts, cs = bm25_term_stats(docs.filter(F.col("doc_id") % 5 != 4))
    save_bm25_index(ts, cs, f"{root}/bm25")

    # ------------------------------------------------------------------
    # The daily loop: ONE code path for all five kinds.
    for path in (f"{root}/ivf", f"{root}/hnsw", f"{root}/pq",
                 f"{root}/ivfpq", f"{root}/bm25"):
        idx = index.open(spark, path)
        if idx.kind == "bm25":
            rep = idx.append(docs.filter(F.col("doc_id") % 5 == 4),
                             batch_id=1)
            print(f"[bm25] appended {rep['appended_docs']} docs")
        elif idx.kind in ("pq", "ivf_pq"):
            rep = idx.append(batch, batch_id=1)
            mse = rep.get("batch_mse")
            print(f"[{idx.kind}] appended {rep['appended_rows']} rows, "
                  f"batch_mse={mse:.5f}")
            # drift policy: codebooks trained pre-append; when a batch's
            # quantization error climbs well past the train baseline,
            # retrain IN PLACE — codes re-encode (m bytes/vector),
            # vectors + cell layout + replay log untouched
            rrep = idx.refresh(hist.unionByName(batch))
            print(f"[{idx.kind}] refreshed codebooks: train_mse "
                  f"{rrep['train_mse_before']:.5f} -> "
                  f"{rrep['train_mse_after']:.5f} "
                  f"({rrep['reencoded_rows']} codes re-encoded)")
            idx.compact()
            idx.gc(keep_last_batches=8)
        elif idx.kind == "hnsw":
            idx.append(batch, seed=7)
            stats = idx.health()
            print(f"[hnsw] appended; shards={stats['num_shards']} "
                  f"mean_degree={stats['mean_degree_l0']:.1f}")
            idx.rebalance()
        else:  # ivf
            idx.append(batch)
            print("[ivf] appended into touched cells")

    # ------------------------------------------------------------------
    # Serve one query through every handle — same entry point.
    qv = [float(x) for x in hist.first()["embedding"]]
    for path in (f"{root}/ivf", f"{root}/hnsw", f"{root}/pq",
                 f"{root}/ivfpq"):
        idx = index.open(spark, path)
        kw = {"vectors": emb} if idx.kind in ("pq", "ivf_pq") else {}
        top = idx.search(qv, k=3, **kw).collect()
        print(f"[{idx.kind}] top-3: {[int(r.vec_id) for r in top]}")
    top = index.open(spark, f"{root}/bm25").search(
        "data pipeline quality", k=3, docs=docs
    ).collect()
    print(f"[bm25] lexical top-3 served through the same handle: "
          f"{[int(r.doc_id) for r in top]}")

    print("estate maintained: five kinds, one loop")


if __name__ == "__main__":
    main()
