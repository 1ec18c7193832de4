"""Scale probe: key operators at 1M vectors / 100k docs (local[32]).

Synthesizes larger corpora from the sf0.1 fixtures (unique ids), times
the flagship operators, prints one JSON line.  Evidence for the
ARCHITECTURE.md scale claims; not part of the driver bench.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from astro_vectordb_spark.session import get_spark


def timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb1m = (
        emb.crossJoin(spark.range(500).withColumnRenamed("id", "rep"))
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000).alias("vec_id"),
            # perturb first element so replicas aren't exact dups
            F.concat(
                F.array(F.element_at("embedding", 1) + F.col("rep") / 1e6),
                F.slice("embedding", 2, 63),
            ).cast("array<float>").alias("embedding"),
        )
    )
    # crossJoin(BNLJ) collapses to the left side's partitioning — spread
    # the synthesized corpus before writing or everything downstream
    # runs on one core
    emb1m.repartition(32).write.mode("overwrite").parquet("/tmp/scale/emb1m")
    emb1m = spark.read.parquet("/tmp/scale/emb1m")
    out["corpus_rows"] = emb1m.count()

    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]

    from astro_vectordb_spark.operators.topk import batch_topk, topk_search

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm
    noop(topk_search(emb1m, qv, 10, strength=0))
    out["topk_expr_1m_sec"] = timed(lambda: noop(topk_search(emb1m, qv, 10, strength=0)))
    out["topk_np_1m_sec"] = timed(
        lambda: noop(topk_search(emb1m, qv, 10, strength=0, kernel="numpy"))
    )

    queries = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out["batch_topk_16q_1m_salted_sec"] = timed(
        lambda: noop(batch_topk(emb1m, queries, 10, num_salts=8))
    )
    out["batch_topk_16q_1m_unsalted_sec"] = timed(
        lambda: noop(batch_topk(emb1m, queries, 10, num_salts=1))
    )

    # quantized two-stage top-K at 1M: stage 1 scans the persisted
    # compact (qvec, qscale) table (~4x less IO than the float column),
    # stage 2 exact-reranks 40 broadcast ids against full precision
    from astro_vectordb_spark.operators.quantize import (
        quantize_embeddings,
        topk_search_quantized,
    )

    quantize_embeddings(emb1m).write.mode("overwrite").parquet(
        "/tmp/scale/emb1m_q"
    )
    q1m = spark.read.parquet("/tmp/scale/emb1m_q")
    noop(topk_search_quantized(q1m, emb1m, qv, 10, strength=0))  # warm
    out["topk_quantized_2stage_1m_sec"] = timed(
        lambda: noop(topk_search_quantized(q1m, emb1m, qv, 10, strength=0))
    )

    from astro_vectordb_spark.operators.crud import sync_merge

    delta = emb1m.filter(F.col("vec_id") % 10 == 0).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    out["sync_merge_1m_vs_100k_sec"] = timed(
        lambda: noop(sync_merge(emb1m.select("vec_id", "embedding"), delta.select("vec_id", "embedding")))
    )

    from astro_vectordb_spark.operators.ann import ivf_build_sampled, ivf_search

    t0 = time.time()
    assigned, centroids = ivf_build_sampled(emb1m, k_cells=64)
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet("/tmp/scale/ivf1m")
    out["ivf_build_write_1m_sec"] = round(time.time() - t0, 2)
    assigned2 = spark.read.parquet("/tmp/scale/ivf1m")
    out["ivf_search_1m_nprobe8of64_sec"] = timed(
        lambda: noop(ivf_search(assigned2, centroids, qv, 10, nprobe=8))
    )

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs100k = (
        docs.crossJoin(spark.range(20).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") + F.col("rep") * 100_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias("text"),
        )
    )
    docs100k.repartition(32).write.mode("overwrite").parquet("/tmp/scale/docs100k")
    docs100k = spark.read.parquet("/tmp/scale/docs100k")
    out["docs_rows"] = docs100k.count()

    from astro_vectordb_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    out["exact_dedup_100k_sec"] = timed(lambda: noop(exact_dedup(docs100k)))
    out["minhash_lsh_100k_sec"] = timed(
        lambda: noop(minhash_lsh_pairs(docs100k, 0.8, num_hashes=32, bands=8))
    )
    out["jaccard_allpairs_100k_sec"] = timed(
        lambda: noop(ngram_jaccard_pairs(docs100k, 0.8))
    )

    # retrieval stack at 100k docs: BM25 (zero corpus shuffles),
    # chunking (pure codegen), chunk-embed (the pandas_udf hook cost,
    # materialized once like a real pipeline), MaxSim late interaction
    from astro_vectordb_spark.functions.embed import embed_text
    from astro_vectordb_spark.operators.keyword import bm25_topk
    from astro_vectordb_spark.operators.multivector import (
        chunk_documents,
        maxsim_topk,
    )

    noop(bm25_topk(docs100k, ["merge", "hash", "spark"], 10))  # warm
    out["bm25_100k_sec"] = timed(
        lambda: noop(bm25_topk(docs100k, ["merge", "hash", "spark"], 10))
    )
    out["chunk_100k_sec"] = timed(
        lambda: noop(chunk_documents(docs100k, chunk_tokens=10, stride=5))
    )
    t0 = time.time()
    embed_text(
        chunk_documents(docs100k, chunk_tokens=10, stride=5),
        text_col="chunk_text",
    ).write.mode("overwrite").parquet("/tmp/scale/chunkvecs")
    out["chunk_embed_write_100k_sec"] = round(time.time() - t0, 2)
    cvr = spark.read.parquet("/tmp/scale/chunkvecs")
    out["chunk_rows"] = cvr.count()
    qvs = [
        r["embedding"]
        for r in cvr.filter(
            (F.col("doc_id") == 0) & (F.col("chunk_id") < 2)
        ).orderBy("chunk_id").collect()
    ]
    noop(maxsim_topk(cvr, qvs, 10))  # warm
    out["maxsim_2q_100k_sec"] = timed(lambda: noop(maxsim_topk(cvr, qvs, 10)))

    # product quantization at 1M x 64-d: train on a bounded sample,
    # encode distributed, ADC candidate scan over the 8-byte codes +
    # exact re-rank; compare storage vs float32 and int8, and recall
    # vs the exact scan
    import os as _os

    from astro_vectordb_spark.operators.pq import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    t0 = time.time()
    pqm = pq_train(emb1m, m=8, ks=256, max_rows=50_000)
    out["pq_train_1m_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    pq_encode(emb1m, pqm).write.mode("overwrite").parquet("/tmp/scale/emb1m_pq")
    out["pq_encode_write_1m_sec"] = round(time.time() - t0, 2)
    pq1m = spark.read.parquet("/tmp/scale/emb1m_pq")

    def _dir_bytes(p):
        return sum(
            _os.path.getsize(_os.path.join(r, f))
            for r, _, fs in _os.walk(p)
            for f in fs
        )

    out["bytes_float32_1m"] = _dir_bytes("/tmp/scale/emb1m")
    out["bytes_int8_1m"] = _dir_bytes("/tmp/scale/emb1m_q")
    out["bytes_pq_1m"] = _dir_bytes("/tmp/scale/emb1m_pq")
    noop(pq_topk(pq1m, emb1m, qv, 10, pqm))  # warm
    out["pq_topk_2stage_1m_sec"] = timed(
        lambda: noop(pq_topk(pq1m, emb1m, qv, 10, pqm))
    )
    exact_ids = {
        r["vec_id"] for r in topk_search(emb1m, qv, 10, strength=0).collect()
    }
    pq_ids = {r["vec_id"] for r in pq_topk(pq1m, emb1m, qv, 10, pqm).collect()}
    out["pq_recall_at_10_1m"] = round(len(exact_ids & pq_ids) / 10, 2)

    # curation sweep at 100k docs: repetition stats, quality gate,
    # decontamination vs a 1% benchmark
    from astro_vectordb_spark.operators.curation import (
        decontaminate,
        gopher_filter,
        repetition_stats,
    )

    noop(repetition_stats(docs100k))  # warm
    out["repetition_stats_100k_sec"] = timed(
        lambda: noop(repetition_stats(docs100k))
    )
    out["gopher_filter_100k_sec"] = timed(lambda: noop(gopher_filter(docs100k)))
    bench_docs = docs100k.filter(F.col("doc_id") % 97 == 0)
    out["decontaminate_100k_sec"] = timed(
        lambda: noop(decontaminate(docs100k, bench_docs, n=8))
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
