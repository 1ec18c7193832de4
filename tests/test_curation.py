"""Curation operators: repetition stats, Gopher gate, decontamination.

The synthetic corpus is uniformly clean, so these tests build
adversarial documents that actually trip each rule.
"""

import pytest
from pyspark.sql import functions as F

from astro_vectordb_spark.operators.curation import (
    decontaminate,
    doc_ngram_set,
    gopher_filter,
    ngrams,
    repetition_stats,
)

DOCS = [
    # 0: clean prose-ish
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    # 1: pathological repetition (one trigram looped)
    (1, "buy now click here buy now click here buy now click here buy now"),
    # 2: single dominant token
    (2, "spam spam spam spam spam spam spam spam spam eggs"),
    # 3: too short
    (3, "hi there"),
    # 4: symbol-heavy
    (4, "a ; b . c ! d ? e : f , g ; h . i ! j ? k"),
    # 5: empty after trim
    (5, "   "),
    # 6: long-word garbage (avg token length out of band)
    (6, "aaaaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbbbb cccccccccccccccccccc dddddddddddddddddddd eeeeeeeeeeeeeeeeeeee"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _by_id(pdf):
    return {int(r.doc_id): r for r in pdf.itertuples()}


class TestNgrams:
    def test_ngram_windows(self, spark):
        df = spark.createDataFrame([("a b c d",)], "text string")
        from astro_vectordb_spark.functions.text import tokens

        row = df.select(
            ngrams(tokens(F.col("text")), 2).alias("g2"),
            ngrams(tokens(F.col("text")), 3).alias("g3"),
            ngrams(tokens(F.col("text")), 5).alias("g5"),
        ).first()
        assert row["g2"] == ["a b", "b c", "c d"]
        assert row["g3"] == ["a b c", "b c d"]
        assert row["g5"] == []


class TestRepetitionStats:
    def test_values(self, docs):
        r = _by_id(repetition_stats(docs).toPandas())
        # doc 1: "buy now click here" x3 + "buy now" tail = 14 tokens
        assert r[1].n_tokens == 14
        # "buy" and "now" each appear 4x of 14
        assert r[1].top_unigram_frac == round(4 / 14, 6)
        # every trigram in the loop repeats -> dup fraction near 1
        assert r[1].dup_trigram_frac > 0.9
        # doc 2: spam 9/10
        assert r[2].top_unigram_frac == 0.9
        # doc 0 has 'the' 3x / 14 tokens, no repeated trigram
        assert r[0].dup_trigram_frac == 0.0
        # doc 3: too short for trigrams -> 0.0, bigram "hi there" 1/1
        assert r[3].dup_trigram_frac == 0.0
        assert r[3].top_bigram_frac == 1.0
        # empty doc present with zeros
        assert r[5].n_tokens == 0
        assert r[5].top_unigram_frac == 0.0

    def test_every_input_doc_present(self, docs):
        out = repetition_stats(docs).toPandas()
        assert sorted(out.doc_id) == [d[0] for d in DOCS]


class TestGopherFilter:
    def test_rules_attribute_rejections(self, docs):
        r = _by_id(gopher_filter(docs).toPandas())
        assert r[0].keep  # clean doc passes everything
        assert not r[1].trigram_ok and not r[1].keep
        assert not r[2].unigram_ok and not r[2].keep
        assert not r[3].len_ok and not r[3].keep
        assert not r[4].symbol_ok and not r[4].keep
        assert not r[5].len_ok
        assert not r[6].word_len_ok and not r[6].keep

    def test_thresholds_parameterizable(self, docs):
        loose = gopher_filter(
            docs,
            min_tokens=1,
            max_top_unigram_frac=1.0,
            max_dup_trigram_frac=1.0,
            max_symbol_ratio=10.0,
            min_avg_token_len=0.0,
            max_avg_token_len=1e9,
        ).toPandas()
        assert loose.keep.sum() == len(DOCS) - 1  # only the empty doc fails


class TestDecontaminate:
    def test_shared_ngram_flags(self, spark):
        train = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon zeta"),
                (1, "one two three four five six"),
                (2, "alpha beta gamma delta epsilon other"),  # 5-gram overlap? no: needs identical window
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "xx alpha beta gamma delta epsilon yy")],
            "doc_id long, text string",
        )
        out = _by_id(decontaminate(train, bench, n=5).toPandas())
        # doc 0 contains the exact 5-gram "alpha beta gamma delta epsilon"
        assert out[0].contaminated and out[0].n_hits == 1
        assert not out[1].contaminated
        # doc 2 shares only a 4-gram window followed by a different token:
        # its 5-grams are "alpha beta gamma delta epsilon" (yes! tokens 1-5)
        assert out[2].contaminated
        # 4-gram-only overlap is NOT flagged at n=5
        train2 = bench = None

    def test_no_overlap_below_n(self, spark):
        train = spark.createDataFrame(
            [(0, "alpha beta gamma delta other tail")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(1, "alpha beta gamma delta DIFFERENT end")], "doc_id long, text string"
        )
        out = decontaminate(train, bench, n=5).toPandas()
        assert not bool(out.contaminated[0])

    def test_hits_count_distinct_grams(self, spark):
        # the same contaminated gram repeated in the training doc counts once
        train = spark.createDataFrame(
            [(0, "a b c d e a b c d e")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(9, "a b c d e")], "doc_id long, text string"
        )
        out = decontaminate(train, bench, n=5).toPandas()
        # train 5-grams: {a b c d e, b c d e a, c d e a b, d e a b c, e a b c d}
        # bench has only "a b c d e"
        assert int(out.n_hits[0]) == 1

    def test_benchmark_side_is_broadcast(self, docs):
        bench = docs.filter(F.col("doc_id") == 0)
        plan = decontaminate(docs, bench, n=3)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # the corpus-side gram stream is never sort-merge-joined (the
        # only gram-keyed exchange is the tiny benchmark side's
        # distinct); the doc_id-keyed left join back to docs may be SMJ
        # and AQE converts it to broadcast when hits are few
        assert "SortMergeJoin [gram" not in plan


class TestScaleShape:
    def test_repetition_stats_no_udf(self, docs):
        plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_gopher_no_udf(self, docs):
        plan = gopher_filter(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_doc_ngram_set_distinct(self, spark):
        df = spark.createDataFrame([(0, "x y x y x y")], "doc_id long, text string")
        out = doc_ngram_set(df, 2).toPandas()
        assert sorted(out.gram) == ["x y", "y x"]


class TestPackDocuments:
    def test_contiguous_fill(self, spark):
        from astro_vectordb_spark.operators.curation import pack_documents

        # one bucket, doc token counts 50,80,90,30 with budget 100:
        # offsets 0,50,130,220 -> packs 0,0,1,2
        docs = spark.createDataFrame(
            [
                (0, " ".join(["w"] * 50)),
                (1, " ".join(["w"] * 80)),
                (2, " ".join(["w"] * 90)),
                (3, " ".join(["w"] * 30)),
            ],
            "doc_id long, text string",
        )
        out = {
            int(r.doc_id): r
            for r in pack_documents(
                docs, max_tokens=100, n_buckets=1
            ).collect()
        }
        assert [out[i].pack_id for i in range(4)] == [0, 0, 1, 2]
        assert [out[i].start_offset for i in range(4)] == [0, 50, 130, 220]

    def test_buckets_independent(self, spark):
        from astro_vectordb_spark.operators.curation import pack_documents

        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * 10)) for i in range(20)],
            "doc_id long, text string",
        )
        out = pack_documents(docs, max_tokens=25, n_buckets=4).toPandas()
        # each bucket has 5 docs of 10 tokens: offsets 0,10,20,30,40 ->
        # packs 0,0,0,1,1 within every bucket
        for b in range(4):
            sub = out[out.bucket == b].sort_values("doc_id")
            assert list(sub.pack_id) == [0, 0, 0, 1, 1]

    def test_no_global_window(self, spark):
        from astro_vectordb_spark.operators.curation import pack_documents

        docs = spark.createDataFrame(
            [(i, "a b c") for i in range(8)], "doc_id long, text string"
        )
        plan = pack_documents(docs, 100)._jdf.queryExecution().executedPlan().toString()
        # the window partitions by bucket — never a single global partition
        assert "SinglePartition" not in plan


class TestDecontaminateFuzzy:
    def _planted(self, spark, seed=3):
        # 30 benchmark docs of 60 words; the corpus holds a ~12%-word-
        # substituted paraphrase of each (every 8th word swapped) plus
        # 60 unrelated docs
        import numpy as np

        rng = np.random.RandomState(seed)
        vocab = [f"tok{i}" for i in range(400)]
        bench_rows, para_rows, clean_rows = [], [], []
        for i in range(30):
            words = [vocab[rng.randint(400)] for _ in range(60)]
            bench_rows.append((1000 + i, " ".join(words)))
            para = list(words)
            for j in range(0, 60, 8):
                para[j] = vocab[rng.randint(400)]
            para_rows.append((i, " ".join(para)))
        for i in range(60):
            clean_rows.append(
                (100 + i, " ".join(vocab[rng.randint(400)] for _ in range(60)))
            )
        docs = spark.createDataFrame(
            para_rows + clean_rows, "doc_id long, text string"
        )
        bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
        return docs, bench

    def test_catches_paraphrases_exact_misses(self, spark):
        from astro_vectordb_spark.operators.curation import (
            decontaminate,
            decontaminate_fuzzy,
        )

        docs, bench = self._planted(spark)
        fuzzy = decontaminate_fuzzy(docs, bench, threshold=0.3).toPandas()
        flagged = set(fuzzy[fuzzy.contaminated].doc_id)
        # >= 28/30 planted paraphrases caught (r=2 banding is ~97%
        # per doc at this edit density; seed-deterministic), with
        # full precision
        assert len(flagged & set(range(30))) >= 28
        assert not (flagged & set(range(100, 160)))
        # the exact 8-gram sweep misses most of the same paraphrases
        # (a swap every 8 words breaks every 8-gram run)
        exact = decontaminate(docs, bench, n=8).toPandas()
        exact_flagged = set(exact[exact.contaminated].doc_id) & set(range(30))
        assert len(exact_flagged) < 10

    def test_clean_corpus_all_zero(self, spark):
        from astro_vectordb_spark.operators.curation import (
            decontaminate_fuzzy,
        )

        docs, bench = self._planted(spark, seed=9)
        clean_only = docs.filter(F.col("doc_id") >= 100)
        out = decontaminate_fuzzy(clean_only, bench, threshold=0.3).toPandas()
        assert not out.contaminated.any()
        assert (out.n_matches == 0).all() and (out.max_jaccard == 0.0).all()

    def test_benchmark_side_broadcast(self, spark):
        from astro_vectordb_spark.operators.curation import (
            decontaminate_fuzzy,
        )

        docs, bench = self._planted(spark)
        plan = (
            decontaminate_fuzzy(docs, bench)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestPackStrict:
    def test_next_fit_hard_budget(self, spark):
        from astro_vectordb_spark.operators.curation import (
            pack_documents_strict,
        )

        # token counts 50,80,90,30, budget 100: next-fit gives packs
        # 0 (50), 1 (80), 2 (90), 2 (90+30 overflows? 90+30=120>100 ->
        # pack 3) — wait: 50+80=130>100 so 80 opens pack 1; 80+90>100
        # so 90 opens pack 2; 90+30=120>100 so 30 opens pack 3
        docs = spark.createDataFrame(
            [
                (0, " ".join(["w"] * 50)),
                (1, " ".join(["w"] * 80)),
                (2, " ".join(["w"] * 90)),
                (3, " ".join(["w"] * 30)),
            ],
            "doc_id long, text string",
        )
        out = {
            int(r.doc_id): r
            for r in pack_documents_strict(
                docs, max_tokens=100, n_buckets=1
            ).collect()
        }
        assert [out[i].pack_id for i in range(4)] == [0, 1, 2, 3]

    def test_property_no_pack_exceeds_budget(self, spark):
        import numpy as np

        from astro_vectordb_spark.operators.curation import (
            pack_documents_strict,
        )

        rng = np.random.RandomState(5)
        sizes = rng.randint(1, 90, size=200)
        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * int(s))) for i, s in enumerate(sizes)],
            "doc_id long, text string",
        )
        out = pack_documents_strict(docs, max_tokens=128, n_buckets=8)
        agg = (
            out.groupBy("bucket", "pack_id")
            .agg(F.sum("n_tokens").alias("tot"))
            .toPandas()
        )
        # no doc exceeds the budget -> NO pack may exceed it
        assert (agg.tot <= 128).all()
        # and every doc is packed exactly once
        assert out.count() == 200

    def test_oversized_doc_isolated(self, spark):
        from astro_vectordb_spark.operators.curation import (
            pack_documents_strict,
        )

        docs = spark.createDataFrame(
            [
                (0, " ".join(["w"] * 40)),
                (1, " ".join(["w"] * 500)),  # oversized
                (2, " ".join(["w"] * 40)),
            ],
            "doc_id long, text string",
        )
        out = pack_documents_strict(
            docs, max_tokens=100, n_buckets=1
        ).toPandas().set_index("doc_id")
        # the oversized doc sits alone; neighbors are unaffected
        assert out.loc[1, "pack_id"] not in (
            out.loc[0, "pack_id"], out.loc[2, "pack_id"],
        )
        packmates = out[out.pack_id == out.loc[1, "pack_id"]]
        assert len(packmates) == 1

    def test_matches_sequential_reference(self, spark):
        import numpy as np

        from astro_vectordb_spark.operators.curation import (
            pack_documents_strict,
        )

        rng = np.random.RandomState(11)
        sizes = rng.randint(1, 120, size=150)
        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * int(s))) for i, s in enumerate(sizes)],
            "doc_id long, text string",
        )
        got = (
            pack_documents_strict(docs, max_tokens=150, n_buckets=4)
            .toPandas()
            .sort_values("doc_id")
        )
        # plain-python replay of the same greedy
        state = {}
        for i in range(150):
            b = i % 4
            pack, fill = state.get(b, (0, 0))
            n = int(sizes[i])
            if fill > 0 and fill + n > 150:
                pack, fill = pack + 1, 0
            fill += n
            state[b] = (pack, fill)
            row = got[got.doc_id == i].iloc[0]
            assert (int(row.bucket), int(row.pack_id)) == (b, pack), i


    def test_zero_token_prefix_then_oversized(self, spark):
        # a bucket whose leading docs have 0 tokens followed by an
        # oversized doc: the empty pack (fill == 0) must ACCEPT the
        # oversized doc rather than open a new pack — the case where
        # a `fill + n > max`-only rule (the old oracle CTE) diverges
        from astro_vectordb_spark.operators.curation import (
            pack_documents_strict,
        )

        docs = spark.createDataFrame(
            [(0, ""), (1, ""), (2, " ".join(["w"] * 500)), (3, "a b")],
            "doc_id long, text string",
        )
        got = {
            int(r["doc_id"]): int(r["pack_id"])
            for r in pack_documents_strict(
                docs, max_tokens=100, n_buckets=1
            ).collect()
        }
        # docs 0,1 (0 tokens) and 2 (oversized) share pack 0: fill
        # stays 0 through the empty docs, so doc 2 lands in the open
        # pack; doc 3 then opens pack 1 because fill (500) > 0
        assert got == {0: 0, 1: 0, 2: 0, 3: 1}


class TestRedactPii:
    def test_categories_and_order(self, spark):
        from astro_vectordb_spark.operators.curation import redact_pii

        df = spark.createDataFrame(
            [
                (0, "mail jane.doe+x@sub.example.co.uk now"),
                (1, "host 10.0.255.7 and 192.168.0.1 up"),
                (2, "call +1 (555) 123-4567 today"),
                (3, "clean"),
                # email first: its digit-bearing local part must not be
                # half-eaten by the phone pattern
                (4, "a12345678@example.com"),
            ],
            "doc_id long, text string",
        )
        out = {int(r.doc_id): r for r in redact_pii(df).toPandas().itertuples()}
        assert out[0].text_redacted == "mail [EMAIL] now" and out[0].n_email == 1
        assert out[1].n_ipv4 == 2 and "[IPV4]" in out[1].text_redacted
        assert out[2].n_phone == 1 and out[2].text_redacted == "call [PHONE] today"
        assert out[3].n_pii == 0 and out[3].text_redacted == "clean"
        assert out[4].n_email == 1 and out[4].text_redacted == "[EMAIL]"
        assert out[4].n_phone == 0

    def test_no_shuffle_no_udf(self, spark):
        from astro_vectordb_spark.operators.curation import redact_pii

        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestEdgeInputs:
    def test_empty_corpus_everywhere(self, spark):
        from astro_vectordb_spark.operators.curation import (
            decontaminate,
            gopher_filter,
            pack_documents,
            redact_pii,
            repetition_stats,
        )

        empty = spark.createDataFrame([], "doc_id long, text string")
        some = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
        assert repetition_stats(empty).count() == 0
        assert gopher_filter(empty).count() == 0
        assert pack_documents(empty, 100).count() == 0
        assert redact_pii(empty).count() == 0
        # empty benchmark: nothing contaminated, every doc retained
        out = decontaminate(some, empty, n=2).toPandas()
        assert len(out) == 1 and not bool(out.contaminated[0])
        # empty corpus against a real benchmark
        assert decontaminate(empty, some, n=2).count() == 0

    def test_null_text_rows_survive(self, spark):
        from astro_vectordb_spark.operators.curation import (
            gopher_filter,
            repetition_stats,
        )

        df = spark.createDataFrame(
            [(0, None), (1, "a b c d e f")], "doc_id long, text string"
        )
        reps = {int(r.doc_id): r for r in repetition_stats(df).toPandas().itertuples()}
        assert reps[0].n_tokens == 0 and reps[0].top_unigram_frac == 0.0
        assert reps[1].n_tokens == 6
        gf = {int(r.doc_id): r for r in gopher_filter(df).toPandas().itertuples()}
        assert not gf[0].keep  # null text fails the length rule


class TestCorpusSummary:
    def test_values(self, spark):
        from astro_vectordb_spark.operators.curation import corpus_summary

        df = spark.createDataFrame(
            [
                (0, "aa bb cc", "en", "s1"),
                (1, "dddd ee", "en", "s1"),
                (2, "x", "fr", "s2"),
            ],
            "doc_id long, text string, lang string, source string",
        )
        out = {
            (r.lang, r.source): r
            for r in corpus_summary(df).toPandas().itertuples()
        }
        en = out[("en", "s1")]
        assert en.n_docs == 2 and en.n_tokens == 5
        assert en.avg_tokens == 2.5
        # token chars: 2+2+2 + 4+2 = 12 over 5 tokens
        assert en.avg_token_len == 2.4
        fr = out[("fr", "s2")]
        assert fr.n_docs == 1 and fr.min_chars == 1 and fr.max_chars == 1


class TestMixtureWeights:
    def test_budget_and_fracs(self, spark):
        from astro_vectordb_spark.operators.curation import mixture_weights

        # en: 100 tokens, fr: 10 tokens; target 50/50 -> fr binds:
        # budget = 10/0.5 = 20 kept tokens; en frac = 0.5*20/100 = 0.1
        df = spark.createDataFrame(
            [(0, " ".join(["w"] * 100), "en"), (1, " ".join(["w"] * 10), "fr")],
            "doc_id long, text string, lang string",
        )
        out = {
            r.lang: r
            for r in mixture_weights(df, {"en": 0.5, "fr": 0.5})
            .toPandas()
            .itertuples()
        }
        assert out["fr"].frac == 1.0  # binding group keeps everything
        assert out["en"].frac == 0.1
        assert out["en"].target_share == 0.5

    def test_unlisted_group_dropped(self, spark):
        from astro_vectordb_spark.operators.curation import mixture_weights

        df = spark.createDataFrame(
            [(0, "a b", "en"), (1, "c d", "zz")],
            "doc_id long, text string, lang string",
        )
        out = {
            r.lang: r
            for r in mixture_weights(df, {"en": 1.0}).toPandas().itertuples()
        }
        assert out["zz"].frac == 0.0 and out["en"].frac == 1.0

    def test_composes_with_stratified_sample(self, spark):
        from astro_vectordb_spark.operators.curation import mixture_weights
        from astro_vectordb_spark.operators.sampling import stratified_sample

        rows = []
        for i in range(800):
            lang = "en" if i % 4 else "fr"  # 600 en / 200 fr docs
            rows.append((i, " ".join(["w"] * 10), lang))
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        w = {
            r.lang: float(r.frac)
            for r in mixture_weights(df, {"en": 0.5, "fr": 0.5})
            .toPandas()
            .itertuples()
        }
        kept = stratified_sample(df, "lang", w).groupBy("lang").count()
        counts = {r["lang"]: r["count"] for r in kept.collect()}
        # fr (200 docs) binds -> all kept; en sampled to ~200
        assert counts["fr"] == 200
        assert abs(counts["en"] - 200) < 40


class TestDupRateBySource:
    def test_rates(self, spark):
        from astro_vectordb_spark.operators.curation import dup_rate_by_source

        df = spark.createDataFrame(
            [
                (0, "same text", "a"),
                (1, "same  TEXT ", "a"),   # normalization dup
                (2, "other", "a"),
                (3, "unique one", "b"),
            ],
            "doc_id long, text string, source string",
        )
        out = {
            r.source: r for r in dup_rate_by_source(df).toPandas().itertuples()
        }
        assert out["a"].n_docs == 3 and out["a"].n_unique == 2
        assert out["a"].dup_rate == round(1 / 3, 6)
        assert out["b"].dup_rate == 0.0


class TestLineRepetitionStats:
    """Line-level Gopher rules: boilerplate repeats whole lines that
    n-gram dominance under-detects."""

    def test_known_fractions(self, spark):
        from astro_vectordb_spark.operators.curation import (
            line_repetition_stats,
        )

        docs = spark.createDataFrame(
            [
                (0, "nav\ncontent one\nnav\nfooter"),      # 2/4 dup
                (1, "a\na\na"),                             # 3/3 dup
                (2, "x\ny\nz"),                             # 0 dup
                (3, "  pad  \n\npad\n   "),                 # trims: 'pad' x2
                (4, ""),                                    # empty
                (5, None),                                  # NULL text
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (
                r["n_lines"], r["dup_line_frac"], r["dup_line_char_frac"]
            )
            for r in line_repetition_stats(docs).collect()
        }
        assert got[0] == (4, 0.5, round(6 / 23, 6))
        assert got[1] == (3, 1.0, 1.0)
        assert got[2] == (3, 0.0, 0.0)
        # '  pad  ' trims equal to 'pad' -> 2 dup occurrences of 2
        assert got[3] == (2, 1.0, 1.0)
        assert got[4] == (0, 0.0, 0.0)
        assert got[5] == (0, 0.0, 0.0)

    def test_every_doc_present_no_udf(self, spark):
        from astro_vectordb_spark.operators.curation import (
            line_repetition_stats,
        )

        docs = spark.createDataFrame(
            [(i, f"line {i}") for i in range(50)],
            "doc_id long, text string",
        )
        out = line_repetition_stats(docs)
        assert out.count() == 50
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
