"""Regenerate PLANS.md: formatted physical plans of the flagship
queries, so plan quality is reviewable without running Spark."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from astro_vectordb_spark.session import get_spark

SHOW = [
    "topk_exact",
    "batch_topk",
    "topk_quantized",
    "filtered_topk",
    "bm25_topk",
    "chunk_maxsim",
    "sync_merge",
    "near_dup_jaccard",
    "near_dup_minhash",
    "revenue_topn",
    "events_hourly",
    "repetition_stats",
    "decontaminate",
    "ann_pq_topk",
    # round 8: the facade's exact path must show the same
    # TakeOrderedAndProject + PushedFilters shape as topk_exact, and
    # the new curation operators must stay UDF-free aggregations
    "facade_exact_topk",
    "line_dup_stats",
    "curation_e2e",
    # round 9: the facade's IVF path must show the cell IN-filter as
    # PartitionFilters on the cell-partitioned vectors table
    "facade_ivf_gate",
    # round 9 (cont.): span-level dedup — single-pass window df over
    # gram (no self-join, no recomputed explode), codegen token filter
    "dup_spans",
    "dup_span_removal",
    # round 9 (cont.): batch lexical serving — ONE broadcast of the
    # priced query array into the corpus scan, the BM25 fold as a
    # codegen higher-order aggregate (no (doc, term) explode/shuffle),
    # prereduce before the per-query rank exchange
    "bm25_batch",
    # round 10: the salted cogroup must show BOTH cogroup legs keyed
    # (cell_id, _salt) with the salt table as a BroadcastHashJoin on
    # each, and the rerank facade must keep the cross-encoder's
    # ArrowEvalPython on the bounded candidate set only
    "ann_ivfpq_salted_exact",
    "facade_hybrid_rerank_gate",
    # round 10 (cont.): incremental near-dup — the batch's shingle
    # explode + keyed band join against the persisted compact tables;
    # no scan of the historical documents table anywhere in the plan
    "minhash_index_incremental",
    # round 11: post-sweep serving (the probe's band join hits the
    # physically-deduplicated tables), the residual IVF-PQ exactness
    # face (same salted cogroup shape, per-cell centroid riding the
    # broadcast query side), and the batch PRF loop (batch BM25
    # feedback -> per-query window cut -> dynamic-term refold ->
    # per-query snippet projection; no single-partition stage on the
    # query axis)
    "minhash_apply_sweep",
    "ann_ivfpq_residual_exact",
    "facade_hybrid_prf_batch_gate",
    # round 12: the OPQ face must keep the residual salted-cogroup
    # shape (the rotation changes only broadcast contents, never the
    # plan); the incremental RP match must show the batch's bucket
    # projection joining the PERSISTED bucket/vector tables with no
    # re-projection of the historical corpus; the RP sweep must be a
    # stored-bucket self-join + vector verify + iterative CC with no
    # cross join
    "ann_ivfpq_opq_exact",
    "rp_index_incremental",
    "rp_index_groups",
    # round 12 (cont.): the fixed-centroids SemDeDup gate — broadcast
    # centroid join + per-vector window argmax assignment, within-cell
    # pair join, no cross join anywhere on the corpus axis
    "semdedup_fixed",
    # round 13: the multi-probe RP match must keep the incremental
    # shape (batch-side probe cells joining the persisted buckets —
    # probing adds batch-side rows only, never index work); the
    # incremental SemDeDup match must show the BATCH assigning against
    # broadcast stored centroids (map-side max_by argmax, no window
    # shuffle) and joining the persisted cell/vector tables with no
    # corpus re-assignment
    "rp_index_multiprobe",
    "semdedup_index_incremental",
    # round 14: the incremental SimHash match must show the batch
    # signing only itself and chunk-joining the PERSISTED chunk/sig
    # tables (no historical re-sign); the boundary multi-probe
    # SemDeDup match must keep the batch-only shape — the top-2 probe
    # is one map-side collect/sort/slice aggregation over the
    # broadcast centroids, never a window over n x k rows, and history
    # joins exactly as in the base gate
    "simhash_index_incremental",
    "semdedup_index_multiprobe",
]

HEADER = """# PLANS — flagship physical plans (sf0.01, auto-generated)

Regenerate with `python scripts/dump_plans.py`.  What to look for:
`TakeOrderedAndProject` (top-K without global sort), `BroadcastHashJoin`
/ `BroadcastNestedLoopJoin` (small sides broadcast), `PushedFilters`
(predicates at the parquet reader), single `Exchange` per keyed
aggregation (map-side partial aggregation before it), `AdaptiveSparkPlan`
(AQE re-planning enabled).
"""


def main() -> None:
    spark = get_spark("dump-plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = [HEADER]
    for name in SHOW:
        df = qs[name](spark, "/root/testdata/sf0.01")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"\n## {name}\n\n```\n{plan.strip()}\n```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
