"""Text-analysis expression library (training-data pipeline extensions).

The reference delegates text -> vector embedding to an external model
(README.md:99-109) and has no text operators; these are the extended
capabilities a 100 TB training-data pipeline needs (task brief +
SURVEY.md §7 step 5), built as pure Catalyst expressions so they run
inside whole-stage codegen.

Oracle contract: every function here has a DuckDB-expressible twin
(see __spark_entry__.oracle_sql) — tokenization is whitespace-split on
trimmed text with empty tokens dropped, ratios are float64 divisions
rounded at output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deterministic and oracle-expressible; not a model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "pour"],
}

PUNCT_CLASS = "[.,!?;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text, empty tokens dropped."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: word pieces of <=4 chars.

    A BPE-style tokenizer splits rare long words into pieces; the
    deterministic proxy is ceil(len(word)/4) summed over words — exact
    integer math, oracle-expressible.
    """
    return F.aggregate(
        tokens(text),
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("int"),
    )


def char_count(text: Column) -> Column:
    return F.length(text)


# GPT-2-flavored coarse lexer classes: letter runs, digit runs, single
# non-alnum symbols.  Deliberately restricted to constructs whose
# semantics agree between Java regex (Spark) and RE2 (DuckDB oracle).
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_token_count(text: Column, pattern: str = BPE_REGEX) -> Column:
    """BPE-ish lexer token count (regex alternation, non-overlapping)."""
    return F.regexp_count(text, F.lit(pattern))


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PUNCT_CLASS))


def digit_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit("[0-9]"))


def avg_token_len(text: Column) -> Column:
    """Mean token length, float64 (integer sum / integer count)."""
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def stopword_count(text: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(
        F.filter(tokens(F.lower(text)), lambda t: F.array_contains(sw, t))
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    tc = token_count(text)
    return F.when(tc > 0, stopword_count(text, lang).cast("double") / tc).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0, 1]: rewards stopword presence and sane
    token lengths, penalizes punctuation/digit noise.  Deterministic
    length/punct/stopword formula (task brief: "quality scoring").
    """
    tc = token_count(text)
    swr = stopword_ratio(text)
    atl = avg_token_len(text)
    pr = punct_count(text).cast("double") / F.greatest(char_count(text), F.lit(1))
    dr = digit_count(text).cast("double") / F.greatest(char_count(text), F.lit(1))
    length_ok = F.when((tc >= 5) & (tc <= 5000), F.lit(1.0)).otherwise(F.lit(0.5))
    word_ok = F.when((atl >= 2.0) & (atl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    score = (
        F.lit(0.25) * length_ok
        + F.lit(0.25) * word_ok
        + F.lit(0.25) * F.least(F.lit(1.0), swr * F.lit(4.0))
        + F.lit(0.25) * (F.lit(1.0) - F.least(F.lit(1.0), (pr + dr) * F.lit(5.0)))
    )
    return score


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit count per candidate language."""
    return {lang: stopword_count(text, lang) for lang in STOPWORDS}


def lang_id(text: Column) -> Column:
    """Pick the language with the most stopword hits.

    Ties break to the alphabetically-last language code (struct
    comparison is field-by-field, so ``array_max`` compares hits first,
    then the lang string); 'und' (undetermined) when no hits at all.
    """
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("hits"), F.lit(lang).alias("lang"))
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["hits"] <= 0, F.lit("und")).otherwise(best["lang"])


def bind_once(expr: Column, fn) -> Column:
    """Evaluate ``expr`` ONCE per row and feed it to ``fn`` as a bound
    lambda variable: ``element_at(transform(array(expr), v ->
    fn(v)), 1)``.  Higher-order functions evaluate interpreted (no
    whole-stage codegen) and ProjectCollapse inlines withColumn
    temporaries into every consumer — so an expensive array expression
    referenced N times costs N evaluations unless bound this way.
    Measured: binding the token array in ``word_shingles`` and the
    hits/starts/scores arrays in ``keyword.snippet_extract`` is worth
    2-4x on span-level operators."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def word_shingles(text: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles (space-joined): distinct by default (the
    unit for Jaccard/MinHash near-dup detection); ``distinct=False``
    keeps one entry PER POSITION in document order (the unit for
    duplicate-span accounting, where each occurrence counts)."""

    def build(toks: Column) -> Column:
        m = F.size(toks) - n + 1  # number of shingles
        # n aligned slices + (n-1) zip_with concats = O(tokens) total
        # work; the naive transform-with-slice-per-position shape is
        # O(tokens^2).
        grams = F.slice(toks, 1, m)
        for i in range(1, n):
            grams = F.zip_with(
                grams,
                F.slice(toks, i + 1, m),
                lambda x, y: F.concat(x, F.lit(" "), y),
            )
        out = F.array_distinct(grams) if distinct else grams
        return F.when(F.size(toks) >= n, out).otherwise(
            F.array().cast("array<string>")
        )

    # the token array feeds n slices + 2 size() checks — bound once
    # (it would otherwise re-split the text per reference)
    return bind_once(tokens(F.lower(text)), build)


def fingerprint(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized lowercase text."""
    norm = F.array_join(tokens(F.lower(text)), " ")
    return F.md5(norm)


def sorted_token_fingerprint(text: Column) -> Column:
    """Bag-of-words fingerprint: md5 over the sorted distinct token set —
    catches reorderings of the same vocabulary."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(text)))), " "))


ROLLING_BASE = 1_000_003
ROLLING_MOD = 2_147_483_647  # 2^31 - 1


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash over the token stream (order-sensitive):

        h = fold(tokens, 0, (h, t) -> (h * B + tokhash(t)) mod M)

    with tokhash(t) = a small deterministic per-token integer (sum of
    code points mod M) so the whole thing is pure integer arithmetic —
    bit-reproducible in ANSI SQL (DuckDB ``list_reduce``), unlike
    xxhash64.  All intermediates stay < 2^62, no overflow in int64.
    """
    toks = tokens(F.lower(text))

    def tokhash(t):
        chars = F.transform(
            F.sequence(F.lit(1), F.length(t)),
            lambda i: F.ascii(F.substr(t, i, F.lit(1))).cast("long"),
        )
        return F.aggregate(
            chars, F.lit(0).cast("long"), lambda acc, x: (acc * 131 + x) % ROLLING_MOD
        )

    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * ROLLING_BASE + tokhash(t)) % ROLLING_MOD,
    )
