"""Tests: deterministic splits/samples, table profiling."""

from __future__ import annotations

from pyspark.sql import functions as F

from astro_vectordb_spark.operators.profiling import profile_numeric
from astro_vectordb_spark.operators.sampling import (
    deterministic_sample,
    deterministic_split,
    hash_bucket,
)


def test_split_is_deterministic_and_total(spark, documents):
    s1 = deterministic_split(documents, test_frac=0.2)
    s2 = deterministic_split(documents, test_frac=0.2)
    m1 = {r["doc_id"]: r["split"] for r in s1.collect()}
    m2 = {r["doc_id"]: r["split"] for r in s2.collect()}
    assert m1 == m2
    assert set(m1.values()) <= {"train", "test"}
    n_test = sum(1 for v in m1.values() if v == "test")
    assert 0.1 < n_test / len(m1) < 0.3  # ~20%


def test_split_stable_under_subsetting(spark, documents):
    """A row's split must not depend on which other rows are present."""
    full = {r["doc_id"]: r["split"]
            for r in deterministic_split(documents, test_frac=0.2).collect()}
    half = {r["doc_id"]: r["split"]
            for r in deterministic_split(
                documents.filter(F.col("doc_id") % 2 == 0), test_frac=0.2
            ).collect()}
    for k, v in half.items():
        assert full[k] == v


def test_deterministic_sample_fraction(spark, documents):
    s = deterministic_sample(documents, frac=0.3)
    n = s.count()
    assert 0.2 < n / documents.count() < 0.4
    # idempotent: sampling the sample with the same frac keeps all rows
    assert deterministic_sample(s, frac=0.3).count() == n


def test_hash_bucket_range(spark, documents):
    out = documents.select(hash_bucket(F.col("doc_id")).alias("b"))
    assert out.filter((F.col("b") < 0) | (F.col("b") >= 1000)).count() == 0


def test_profile_numeric(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    prof = {r["column"]: r for r in
            profile_numeric(li, ["l_quantity", "l_discount"],
                            percentiles="exact").collect()}
    q = prof["l_quantity"]
    assert q["n"] == li.count()
    assert q["n_null"] == 0
    assert q["min_v"] <= q["p50"] <= q["p90"] <= q["max_v"]
    import numpy as np

    vals = np.array([r["l_quantity"] for r in li.select("l_quantity").collect()])
    assert abs(q["p50"] - float(np.percentile(vals, 50))) < 1e-6
    assert abs(q["mean_v"] - float(vals.mean())) < 1e-6


def test_profile_numeric_approx_within_tolerance(spark, sf_dir):
    """Default (scale-safe) approx percentiles stay within the sketch's
    rank-error bound of the exact values."""
    import numpy as np

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    accuracy = 10_000
    prof = {r["column"]: r for r in
            profile_numeric(li, ["l_quantity", "l_extendedprice"],
                            accuracy=accuracy).collect()}
    vals = np.sort(
        np.array([r["l_extendedprice"] for r in
                  li.select("l_extendedprice").collect()])
    )
    rank_err = max(1, int(np.ceil(n / accuracy)))
    for p, key in ((0.5, "p50"), (0.9, "p90")):
        lo = vals[max(0, int(p * n) - rank_err - 1)]
        hi = vals[min(n - 1, int(p * n) + rank_err + 1)]
        got = prof["l_extendedprice"][key]
        assert lo - 1e-6 <= got <= hi + 1e-6, (key, got, lo, hi)


def test_rank_percentiles_match_exact(spark, sf_dir):
    """The distributed rank-based percentile path must agree with the
    full-buffer F.percentile path to the last rounded digit — that
    equivalence is what lets the scale-safe plan share the
    quantile_cont oracle."""
    from astro_vectordb_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    by_rank = {
        r["column"]: (r["p50"], r["p90"])
        for r in profile_numeric(li, cols, percentiles="rank").collect()
    }
    by_exact = {
        r["column"]: (r["p50"], r["p90"])
        for r in profile_numeric(li, cols, percentiles="exact").collect()
    }
    assert by_rank == by_exact


def test_rank_percentiles_with_nulls_and_single_value(spark):
    """Nulls are excluded from rank math (quantile semantics); a
    single-value column interpolates to itself."""
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, None), (3.0, 5.0), (None, 5.0), (10.0, None)],
        "a double, b double",
    )
    out = {
        r["column"]: r
        for r in profile_numeric(df, ["a", "b"], percentiles="rank").collect()
    }
    # a: values [1,2,3,10]; p50 -> t=1.5 -> 2 + 0.5*(3-2) = 2.5
    assert out["a"]["p50"] == 2.5
    assert out["a"]["n_null"] == 1
    assert out["b"]["p50"] == 5.0 and out["b"]["p90"] == 5.0


def test_rank_mode_keeps_all_null_column(spark):
    """An all-null column has no histogram rows, but rank mode must
    still return its base-stats row (null p50/p90) — same output shape
    as 'approx'/'exact' modes on the same input."""
    df = spark.createDataFrame(
        [(1.0, None), (2.0, None), (3.0, None)], "a double, b double"
    )
    for mode in ("rank", "approx", "exact"):
        out = {
            r["column"]: r
            for r in profile_numeric(df, ["a", "b"], percentiles=mode).collect()
        }
        assert set(out) == {"a", "b"}, mode
        assert out["b"]["n"] == 0 and out["b"]["n_null"] == 3, mode
        assert out["b"]["p50"] is None and out["b"]["p90"] is None, mode
        assert out["a"]["p50"] is not None, mode


def test_rank_mode_releases_histogram_cache(spark):
    """The internal histogram persist() must be released before
    profile_numeric returns — repeated profiling must not accumulate
    session-lifetime cached RDDs."""
    df = spark.range(0, 5000).select(
        (F.col("id") % 997).cast("double").alias("x"),
        (F.col("id") % 31).cast("double").alias("y"),
    )
    before = int(spark.sparkContext._jsc.getPersistentRDDs().size())
    for _ in range(3):
        profile_numeric(df, ["x", "y"], percentiles="rank").collect()
    after = int(spark.sparkContext._jsc.getPersistentRDDs().size())
    # <=, not ==: Spark's ContextCleaner may asynchronously unpersist
    # unreferenced cached RDDs from EARLIER tests between the two
    # snapshots, dropping the count; a leak here would ADD 3.
    assert after <= before, (before, after)


def test_rank_mode_equidepth_bins_on_lognormal(spark):
    """Heavy-tailed (lognormal) columns: sketch-derived equi-depth bin
    edges must spread DISTINCT values roughly evenly across bins (the
    window-partition memory bound), where equi-width edges would pile
    nearly everything into bin 0 — and results stay exact."""
    import numpy as np

    from astro_vectordb_spark.operators import profiling
    from astro_vectordb_spark.operators.profiling import exact_percentiles_rank

    rng = np.random.default_rng(42)
    vals = np.exp(rng.normal(0.0, 4.0, size=20_000))  # ~20k distinct doubles
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    num_bins = 16
    got = {
        round(r["p"], 2): r["value"]
        for r in exact_percentiles_rank(
            df, ["x"], [0.5, 0.9], num_bins=num_bins
        ).collect()
    }
    for p in (0.5, 0.9):
        want = float(np.percentile(vals, p * 100))
        assert abs(got[round(p, 2)] - want) <= 1e-9 * max(1.0, abs(want)), (
            p, got[round(p, 2)], want,
        )
    occ = profiling.LAST_BIN_OCCUPANCY["x"]
    n_distinct = sum(occ.values())
    mean = n_distinct / num_bins
    # equi-depth: every bin within 3x the mean (equi-width on sigma=4
    # lognormal puts >99% of distinct values into one bin, ~16x mean)
    assert max(occ.values()) <= 3 * mean, occ
    # and the parallelism actually exists: most bins are populated
    assert len(occ) >= num_bins - 2, occ


def test_stratified_sample(spark, documents):
    """Per-stratum fracs hold (+-), unlisted strata use default_frac,
    rows are a subset of their stratum, and the sample is idempotent
    and stable under subsetting."""
    from astro_vectordb_spark.operators.sampling import stratified_sample

    fracs = {"en": 0.2, "zh": 1.0}
    s = stratified_sample(documents, "lang", fracs, default_frac=0.0)
    rows = s.select("doc_id", "lang").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    totals = {
        r["lang"]: r["n"]
        for r in documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # zh kept fully, en roughly 20%, everything else dropped
    assert by_lang.get("zh", set()) and len(by_lang["zh"]) == totals["zh"]
    en_rate = len(by_lang.get("en", set())) / totals["en"]
    assert 0.08 < en_rate < 0.35, en_rate
    assert set(by_lang) <= {"en", "zh"}
    # idempotent: sampling the sample keeps every row
    assert stratified_sample(s, "lang", fracs).count() == len(rows)
    # stable under subsetting: a row's fate is its own
    half = stratified_sample(
        documents.filter(F.col("doc_id") % 2 == 0), "lang", fracs
    )
    kept_all = {r["doc_id"] for r in rows}
    kept_half = {r["doc_id"] for r in half.select("doc_id").collect()}
    assert kept_half == {d for d in kept_all if d % 2 == 0}


def test_sample_cutoff_rounds_not_truncates(spark, documents):
    # frac=0.35 at 1000 buckets: float product is 349.999...; the
    # cutoff must be 350 (rounded), not 349 (truncated) — ADVICE r5
    from astro_vectordb_spark.operators.sampling import (
        deterministic_sample,
        hash_bucket,
    )

    kept = deterministic_sample(documents, frac=0.35)
    expect = documents.filter(hash_bucket(F.col("doc_id")) < 350)
    assert kept.count() == expect.count()
    boundary = documents.filter(hash_bucket(F.col("doc_id")) == 349)
    if boundary.count() > 0:  # bucket 349 rows must be kept at 0.35
        ids = {r["doc_id"] for r in boundary.select("doc_id").collect()}
        kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        assert ids <= kept_ids
