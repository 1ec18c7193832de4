"""Curation-family scaling probe: 100k vs 400k documents.

The 100 TB claim for the curation/dedup operators is *linearity*:
every plan is scans + map-side-combined aggregations + broadcast
joins, so 4x the data should cost ~4x the time (modulo fixed
scheduling overhead — with it, the warm ratio should land well under
the super-linear danger zone).  This probe measures the warm ratio
for each operator at 100k -> 400k synthesized docs and asserts it
stays below 6.0 (4x data, +50% headroom for overhead noise).

Prints one JSON line; evidence artifact: SCALE_PROBE_CURATION.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from astro_vectordb_spark.session import get_spark

RATIO_CAP = 6.0
SIZES = (100_000, 400_000)


def timed(fn) -> float:
    fn()  # warm (JIT + shuffle file reuse paths)
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    spark = get_spark("curation-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sizes": list(SIZES), "ratio_cap": RATIO_CAP}

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    corpora = {}
    for n in SIZES:
        reps = n // 5000
        big = (
            docs.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
            .select(
                (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
                ).alias("text"),
            )
        )
        path = f"/tmp/scale_cur/docs{n}"
        big.repartition(32).write.mode("overwrite").parquet(path)
        corpora[n] = spark.read.parquet(path)
        assert corpora[n].count() == n

    from astro_vectordb_spark.operators.curation import (
        decontaminate,
        gopher_filter,
        pack_documents,
        pack_documents_strict,
        redact_pii,
        repetition_stats,
    )
    from astro_vectordb_spark.operators.dedup import (
        duplicate_spans,
        exact_dedup,
        minhash_lsh_pairs,
        remove_duplicate_spans,
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    ops = {
        "repetition_stats": lambda d: repetition_stats(d),
        "gopher_filter": lambda d: gopher_filter(d),
        "decontaminate": lambda d: decontaminate(
            d, d.filter(F.col("doc_id") % 97 == 0), n=8
        ),
        "pack_documents": lambda d: pack_documents(
            d, max_tokens=500, n_buckets=64
        ),
        # auto-sized n_buckets (None): the derived width must keep
        # per-row wall time flat as data grows
        "pack_strict_auto": lambda d: pack_documents_strict(
            d, max_tokens=500
        ),
        "redact_pii": lambda d: redact_pii(d),
        "exact_dedup": lambda d: exact_dedup(d),
        # span-level dedup family: per-doc output (no pair blowup);
        # the window-over-gram partitions grow linearly with replicas
        "dup_spans": lambda d: duplicate_spans(d, k=8),
        "dup_span_removal": lambda d: remove_duplicate_spans(d, k=8),
        "minhash_lsh": lambda d: minhash_lsh_pairs(
            d, 0.8, num_hashes=32, bands=8
        ),
    }

    # Pair-emitting operators are linear in input PLUS output: the
    # synthesized corpus replicates each base doc (20x at 100k, 80x at
    # 400k), so the number of TRUE near-dup pairs grows quadratically
    # in the replica count (~16x pairs for 4x docs) — runtime must be
    # judged against max(input ratio, output ratio), not input alone.
    # First measured run showed exactly this: minhash 6.9 -> 53.9 s
    # (7.8x) while its output grew ~16x — sub-linear per emitted pair.
    PAIR_OPS = {"minhash_lsh"}

    failures = []
    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    for name, op in ops.items():
        if only and name not in only:
            continue
        t_small = timed(lambda: noop(op(corpora[SIZES[0]])))
        t_big = timed(lambda: noop(op(corpora[SIZES[1]])))
        ratio = round(t_big / max(t_small, 0.05), 2)
        rec = {
            f"sec_{SIZES[0]}": t_small,
            f"sec_{SIZES[1]}": t_big,
            "ratio": ratio,
        }
        if name in PAIR_OPS:
            pairs_small = op(corpora[SIZES[0]]).count()
            pairs_big = op(corpora[SIZES[1]]).count()
            work_ratio = max(
                SIZES[1] / SIZES[0], pairs_big / max(pairs_small, 1)
            )
            rec.update(
                {
                    f"pairs_{SIZES[0]}": pairs_small,
                    f"pairs_{SIZES[1]}": pairs_big,
                    "work_ratio": round(work_ratio, 2),
                    "linear_ok": ratio <= work_ratio * 1.5,
                }
            )
        else:
            rec["linear_ok"] = ratio <= RATIO_CAP
        out[name] = rec
        if not rec["linear_ok"]:
            failures.append(name)

    out["all_linear"] = not failures
    out["failures"] = failures
    print(json.dumps(out))
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
