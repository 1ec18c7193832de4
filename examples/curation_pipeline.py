"""End-to-end CURATION pipeline: what a training-data job runs before
any vector index exists.

quality gate (Gopher rules) -> benchmark decontamination -> exact +
near dedup (MinHash groups) -> sequence packing -> embed survivors ->
PQ-compress + index -> embedding-level near-dup sweep.

Every stage is linear or blocked (no all-pairs anywhere); the only
driver-side materializations are bounded control plane (PQ codebooks,
group representatives count).

Run: python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from astro_vectordb_spark.functions.embed import embed_text
from astro_vectordb_spark.operators.curation import (
    corpus_summary,
    decontaminate,
    dup_rate_by_source,
    gopher_filter,
    mixture_weights,
    pack_documents,
    redact_pii,
    repetition_stats,
)
from astro_vectordb_spark.operators.sampling import stratified_sample
from astro_vectordb_spark.operators.dedup import (
    dedup_keep_representatives,
    exact_dedup,
    minhash_lsh_pairs,
    rp_block_pairs,
)
from astro_vectordb_spark.operators.pq import pq_encode, pq_topk, pq_train
from astro_vectordb_spark.session import get_spark, load_table
from astro_vectordb_spark.sources.vault import load_pq_index, save_pq_index


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("curation-pipeline", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"[0] corpus: {n0} docs")
    worst = (
        dup_rate_by_source(docs)
        .orderBy(F.col("dup_rate").desc())
        .first()
    )
    print(f"[0a] dirtiest source: {worst['source']} "
          f"(dup_rate {worst['dup_rate']})")
    print(f"[0b] summary rows (lang x source): {corpus_summary(docs).count()}")

    # PII scrub before anything else leaves the ingest boundary
    docs = docs.join(
        redact_pii(docs).select("doc_id", "text_redacted"), "doc_id"
    ).select("doc_id", F.col("text_redacted").alias("text"), "lang", "source")

    # 1. quality gate — keep flags attributable, filter on `keep`
    gate = gopher_filter(docs)
    kept = docs.join(gate.filter("keep").select("doc_id"), "doc_id")
    print(f"[1] gopher gate: {kept.count()} pass "
          f"(reject breakdown: {gate.filter('NOT keep').count()} docs)")

    # 2. decontamination vs a held-out "benchmark" slice
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    clean = kept.join(
        decontaminate(kept, bench, n=5).filter("NOT contaminated")
        .select("doc_id"),
        "doc_id",
    )
    print(f"[2] decontaminated: {clean.count()} remain")

    # 3. dedup: exact fingerprints, then MinHash near-dup groups
    exact = exact_dedup(clean)
    pairs = minhash_lsh_pairs(clean, threshold=0.8)
    reps = dedup_keep_representatives(clean, pairs)
    print(f"[3] dedup: {exact.count()} exact-unique, "
          f"{reps.count()} after near-dup groups")

    # 3b. language mixture: move toward a 40/20/20/20 en/de/fr/es
    # token distribution (zh unlisted -> dropped)
    w = {
        r["lang"]: float(r["frac"])
        for r in mixture_weights(
            reps, {"en": 0.4, "de": 0.2, "fr": 0.2, "es": 0.2}
        ).collect()
    }
    reps = stratified_sample(reps, "lang", w)
    print(f"[3b] mixture-resampled: {reps.count()} docs, fracs={w}")

    # 4. sequence packing for the training loader
    packs = pack_documents(reps, max_tokens=200, n_buckets=8)
    n_packs = packs.select("bucket", "pack_id").distinct().count()
    print(f"[4] packed into {n_packs} packs of <=200 tokens")

    # 5. embed survivors (stub hash encoder stands in for the model)
    vecs = embed_text(reps).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )

    # 6. PQ-compress + persist + serve
    model = pq_train(vecs, m=8, ks=16, max_rows=10_000)
    path = tempfile.mkdtemp(prefix="curation_pq_")
    save_pq_index(pq_encode(vecs, model), model, path)
    enc, model2, meta = load_pq_index(spark, path)
    qv = vecs.first()["embedding"]
    top = pq_topk(enc, vecs, qv, 5, model2).collect()
    print(f"[5] PQ index: m={meta['m']} ks={meta['ks']}; "
          f"top-5 for doc-0 vector: {[(r['vec_id'], r['score']) for r in top]}")

    # 7. embedding-level near-dup sweep over the compressed corpus
    near = rp_block_pairs(vecs, threshold=0.95)
    print(f"[6] embedding near-dups >=0.95: {near.count()} pairs")

    # 7b. SemDeDup (round 12): cluster-then-prune semantic dedup —
    # within-cluster exact-cosine groups, keep the paper's
    # farthest-from-centroid exemplar per group
    from astro_vectordb_spark.operators.dedup import semantic_dedup

    sem_keep = semantic_dedup(vecs, eps=0.95, k_cells=16)
    print(f"[6b] SemDeDup keep set: {sem_keep.count()} of "
          f"{vecs.count()} vectors")

    # repetition profile of what survived (monitoring surface)
    reps_stats = repetition_stats(reps)
    print("[7] survivor repetition profile:")
    reps_stats.agg(
        F.round(F.avg("top_unigram_frac"), 4).alias("avg_top_unigram"),
        F.round(F.avg("dup_trigram_frac"), 4).alias("avg_dup_trigram"),
    ).show()
    spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:2]))
