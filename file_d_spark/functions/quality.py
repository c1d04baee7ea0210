"""Corpus-quality filters for training-data pipelines: Gopher-style
repetition metrics, Gopher rule filtering, and C4-style line cleaning.

These implement the published heuristics (Rae et al. 2021 "Scaling
Language Models" appendix A1.1; Raffel et al. 2020 C4 §2.2) as pure
Spark Column expressions / linear aggregations — no Python in the hot
path, no per-document quadratic work:

  repetition metrics   the per-document n-gram statistics (most
                       frequent n-gram's character share, duplicate
                       n-gram character share) are computed by
                       explode -> groupBy(doc, ngram) -> groupBy(doc),
                       which is linear in token count and shuffles on
                       (doc, ngram) — scale-safe where the naive
                       "count occurrences of each distinct n-gram with
                       a nested loop" is O(len^2) per document.
  gopher_filter        pure column expressions over the metrics.
  c4_clean             line-level transform/filter lambdas over
                       split(text, '\\n') — stays in one narrow pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from file_d_spark.functions.text import EN_STOPWORDS, tokens

# --------------------------------------------------------------------------
# Gopher repetition metrics (linear aggregation form)
# --------------------------------------------------------------------------


def _ngram_col(toks: Column, n: int) -> Column:
    """All (non-distinct) word n-grams via shifted slices + zip_with —
    the HOF-safe construction (lambdas touch only element args)."""
    if n == 1:
        return toks
    length = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    zipped = F.slice(toks, 1, length)
    for j in range(1, n):
        zipped = F.zip_with(
            zipped, F.slice(toks, j + 1, length), lambda x, y: F.concat_ws(" ", x, y)
        )
    return zipped


def _tokens_sql(col_sql: str) -> str:
    """SQL-text twin of :func:`file_d_spark.functions.text.tokens` —
    the identical expression, parsed JVM-side in one round trip."""
    return f"filter(split(trim({col_sql}), '\\\\s+'), t -> t != '')"


def _ngram_sql(toks_sql: str, n: int) -> str:
    """SQL-text twin of :func:`_ngram_col` (identical tree).  Large-n
    callers on the plan-build hot path use this: the Column chain
    costs ~15 py4j round trips per zip_with level per plan build."""
    if n == 1:
        return toks_sql
    length = f"greatest(size({toks_sql}) - {n - 1}, 0)"
    zipped = f"slice({toks_sql}, 1, {length})"
    for j in range(1, n):
        zipped = (
            f"zip_with({zipped}, slice({toks_sql}, {j + 1}, {length}), "
            f"(x, y) -> concat_ws(' ', x, y))"
        )
    return zipped


def repetition_metrics(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Per-document repetition statistics (Gopher A1.1 family):

      top_ngram_char_frac  fraction of document characters covered by
                           occurrences of the single most frequent
                           ``top_n``-gram;
      dup_ngram_char_frac  fraction of characters inside ``dup_n``-grams
                           that occur more than once;
      dup_word_frac        fraction of word occurrences that are
                           repeats of an earlier word.

    Output: (id, n_words, top_ngram_char_frac, dup_ngram_char_frac,
    dup_word_frac), one row per input document (documents with no
    ``dup_n``-gram get 0.0).  All fractions rounded to 4dp.
    """
    base = df.select(
        F.col(id_col).alias("doc"),
        tokens(F.col(text_col)).alias("__toks__"),
    ).withColumn("__n_words__", F.size("__toks__"))

    # word-level duplicate fraction: 1 - distinct/total (pure exprs)
    words = base.select(
        "doc",
        "__n_words__",
        F.round(
            F.when(
                F.col("__n_words__") > 0,
                1.0
                - F.size(F.array_distinct("__toks__")).cast("double")
                / F.col("__n_words__"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("dup_word_frac"),
        F.aggregate(
            F.col("__toks__"), F.lit(0), lambda a, t: a + F.length(t)
        ).alias("__word_chars__"),
        _ngram_col(F.col("__toks__"), top_n).alias("__top_grams__"),
        _ngram_col(F.col("__toks__"), dup_n).alias("__dup_grams__"),
    )

    # n-gram stats via linear explode/groupBy (no per-row quadratic scan)
    top = (
        words.select("doc", "__word_chars__", F.explode_outer("__top_grams__").alias("g"))
        .groupBy("doc", "__word_chars__", "g")
        .agg(F.count("g").alias("c"))
        .groupBy("doc", "__word_chars__")
        .agg(
            F.max(
                F.when(
                    F.col("g").isNotNull(),
                    F.col("c") * (F.length("g") - (F.lit(top_n) - 1)),
                ).otherwise(F.lit(0))
            ).alias("top_chars")
        )
        .select(
            "doc",
            # overlapping occurrences can cover more chars than the doc
            # has — clamp like the dup fraction
            F.round(
                F.least(
                    F.col("top_chars").cast("double")
                    / F.greatest(F.col("__word_chars__"), F.lit(1)),
                    F.lit(1.0),
                ),
                4,
            ).alias("top_ngram_char_frac"),
        )
    )
    dup = (
        words.select("doc", "__word_chars__", F.explode_outer("__dup_grams__").alias("g"))
        .groupBy("doc", "__word_chars__", "g")
        .agg(F.count("g").alias("c"))
        .groupBy("doc", "__word_chars__")
        .agg(
            F.sum(
                F.when(
                    F.col("g").isNotNull() & (F.col("c") > 1),
                    F.col("c") * (F.length("g") - (F.lit(dup_n) - 1)),
                ).otherwise(F.lit(0))
            ).alias("dup_chars")
        )
        .select(
            "doc",
            F.round(
                F.least(
                    F.col("dup_chars").cast("double")
                    / F.greatest(F.col("__word_chars__"), F.lit(1)),
                    F.lit(1.0),
                ),
                4,
            ).alias("dup_ngram_char_frac"),
        )
    )
    return (
        words.select("doc", F.col("__n_words__").alias("n_words"), "dup_word_frac")
        .join(top, "doc")
        .join(dup, "doc")
        .withColumnRenamed("doc", id_col)
    )


# --------------------------------------------------------------------------
# Gopher rule filter (pure column expressions)
# --------------------------------------------------------------------------

GOPHER_DEFAULTS = dict(
    min_words=50,
    max_words=100_000,
    min_mean_word_len=3.0,
    max_mean_word_len=10.0,
    max_symbol_word_ratio=0.1,
    max_bullet_line_frac=0.9,
    max_ellipsis_line_frac=0.3,
    min_alpha_word_frac=0.8,
    min_stopword_hits=2,
)


def gopher_signals(text_col: Column) -> dict[str, Column]:
    """The raw per-document signals the Gopher rules threshold."""
    toks = tokens(text_col)
    n_words = F.size(toks)
    lines = F.split(text_col, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    word_chars = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    # the reference rule counts '#' and '...' occurrences as symbols
    symbols = (
        F.length(text_col)
        - F.length(F.regexp_replace(text_col, r"#", ""))
        + (
            F.length(text_col) - F.length(F.regexp_replace(text_col, r"\.\.\.", ""))
        ) / 3
    )
    return {
        "n_words": n_words,
        "mean_word_len": F.round(
            word_chars.cast("double") / F.greatest(n_words, F.lit(1)), 4
        ),
        "symbol_word_ratio": F.round(
            symbols.cast("double") / F.greatest(n_words, F.lit(1)), 4
        ),
        "bullet_line_frac": F.round(
            F.size(
                F.filter(lines, lambda ln: F.trim(ln).rlike(r"^([-*•])"))
            ).cast("double")
            / n_lines,
            4,
        ),
        "ellipsis_line_frac": F.round(
            F.size(F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)$"))).cast(
                "double"
            )
            / n_lines,
            4,
        ),
        "alpha_word_frac": F.round(
            alpha_words.cast("double") / F.greatest(n_words, F.lit(1)), 4
        ),
        "stopword_hits": F.size(
            F.array_intersect(
                F.array_distinct(tokens(F.lower(text_col))),
                F.lit(list(EN_STOPWORDS)),
            )
        ),
    }


def gopher_keep(text_col: Column, **overrides) -> Column:
    """Boolean keep flag under the Gopher quality rules."""
    p = {**GOPHER_DEFAULTS, **overrides}
    s = gopher_signals(text_col)
    return (
        (s["n_words"] >= p["min_words"])
        & (s["n_words"] <= p["max_words"])
        & (s["mean_word_len"] >= p["min_mean_word_len"])
        & (s["mean_word_len"] <= p["max_mean_word_len"])
        & (s["symbol_word_ratio"] <= p["max_symbol_word_ratio"])
        & (s["bullet_line_frac"] <= p["max_bullet_line_frac"])
        & (s["ellipsis_line_frac"] <= p["max_ellipsis_line_frac"])
        & (s["alpha_word_frac"] >= p["min_alpha_word_frac"])
        & (s["stopword_hits"] >= p["min_stopword_hits"])
    )


# --------------------------------------------------------------------------
# C4-style line-level cleaning
# --------------------------------------------------------------------------

C4_BAD_SUBSTRINGS = ["lorem ipsum", "javascript", "{"]


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_line_words: int = 3,
    require_terminal_punct: bool = True,
) -> DataFrame:
    """C4 §2.2 cleaning: keep only lines that end in terminal
    punctuation and have >= ``min_line_words`` words; drop documents
    containing any bad substring (lorem ipsum / javascript / '{') or
    ending up empty.  One narrow pass: split -> filter lambda ->
    array_join; the document drop is an ordinary filter.

    Output: (id, clean_text, n_lines_kept, n_lines_dropped).
    """
    lines = F.split(F.col(text_col), "\n")
    keep_line = lambda ln: (  # noqa: E731
        F.size(tokens(ln)) >= F.lit(min_line_words)
    ) & (
        F.trim(ln).rlike(r'[.!?"]$') if require_terminal_punct else F.lit(True)
    )
    kept = F.filter(lines, keep_line)
    lowered = F.lower(F.col(text_col))
    bad = None
    for s in C4_BAD_SUBSTRINGS:
        cond = lowered.contains(s.lower())
        bad = cond if bad is None else (bad | cond)
    return (
        df.select(
            F.col(id_col),
            F.array_join(kept, "\n").alias("clean_text"),
            F.size(kept).alias("n_lines_kept"),
            (F.size(lines) - F.size(kept)).alias("n_lines_dropped"),
            bad.alias("__bad__"),
        )
        .filter(~F.col("__bad__") & (F.col("n_lines_kept") > 0))
        .drop("__bad__")
    )
