"""Tokenizer-vocabulary induction: distributed BPE merge learning.

Byte-pair-encoding training is the canonical "tokenizer from corpus"
job in an LLM data pipeline, and its distributed shape is pleasant:
after the first aggregation the working set is the WORD VOCABULARY
(word, count) — sublinear in corpus size — and every merge iteration
is one aggregation over it plus a driver-side argmax of ONE row (the
k-means/q90 pattern: the collect is k rows, never data).

Merge semantics (the contract, deliberately engine-portable):
symbols are kept as a delimited string ``|c|a|t|``; one merge step
replaces every non-overlapping, left-to-right occurrence of
``|a|b|`` with ``|ab|`` — i.e. plain string ``replace`` semantics,
identical in Spark (``F.replace``) and DuckDB (``replace``). This
matches canonical BPE except when the SAME pair overlaps itself in a
symbol run (``aaaa`` merges to ``(aa) a (aa)``-style splits rather
than ``(aa)(aa)`` because the shared delimiter is consumed); both
engines implement the identical deterministic rule, which is what the
oracle verifies. Pair selection: highest summed word-count weight,
ties broken by (left, right) ascending — total order, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ursa_major_choir_etl_spark.caching import stage
from ursa_major_choir_etl_spark.operators.text import (
    widen_if_narrow,
    word_tokens,
)


def word_vocabulary(
    df: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> DataFrame:
    """(word, cnt) over lowercase ``[a-z]+`` runs — the one
    corpus-sized aggregation in BPE training; everything after runs
    on vocabulary-sized data."""
    return (
        widen_if_narrow(df)
        .select(F.explode(word_tokens(text_col, tokens_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _adjacent_pairs(words: DataFrame, sym_col: str = "sym") -> DataFrame:
    """Weighted adjacent-symbol pair counts over the vocabulary.

    The symbol array is materialized as a column before the pairing
    lambda (the word_shingles lesson: re-evaluating the split chain
    per array element is quadratic)."""
    syms = words.select(
        "cnt",
        F.filter(F.split(F.col(sym_col), r"\|"), lambda x: x != "").alias("_syms"),
    )
    pairs = syms.select(
        "cnt",
        F.explode(
            F.when(
                F.size("_syms") >= 2,
                F.expr(
                    "transform(sequence(0, size(_syms) - 2),"
                    " i -> struct(_syms[i] AS a, _syms[i + 1] AS b))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.a").alias("left_sym"), F.col("p.b").alias("right_sym")
    ).agg(F.sum("cnt").alias("pair_count"))


def _learn_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    tokens_col: str | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Shared learning loop: returns (merge list, vocabulary with the
    merges applied). Per iteration: one vocabulary-sized aggregation
    (adjacent-pair weights), one 1-row collect (the argmax pair), one
    column-level ``replace`` on the staged vocabulary."""
    words = stage(
        word_vocabulary(df, text_col, tokens_col).withColumn(
            "sym",
            F.concat(
                F.lit("|"), F.regexp_replace(F.col("word"), "(.)", "$1|")
            ),
        )
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _adjacent_pairs(words)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left_sym").asc(),
                F.col("right_sym").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        merges.append(
            (rank, row["left_sym"], row["right_sym"], row["pair_count"])
        )
        pat = f"|{row['left_sym']}|{row['right_sym']}|"
        repl = f"|{row['left_sym']}{row['right_sym']}|"
        words = words.withColumn(
            "sym", F.replace(F.col("sym"), F.lit(pat), F.lit(repl))
        )
    return merges, words


def bpe_merge_table(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
    tokens_col: str | None = None,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a corpus.

    The corpus-sized explode runs exactly once (the staged word
    vocabulary feeds all iterations); iteration i's plan chains i
    cheap replaces on top of the staged scan (see _learn_merges).

    Returns (merge_rank, left_sym, right_sym, pair_count) — one row
    per learned merge, rank 1 = first/most frequent.
    """
    spark: SparkSession = df.sparkSession
    merges, _ = _learn_merges(df, text_col, n_merges, tokens_col)
    return spark.createDataFrame(
        merges,
        schema="merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )


def bpe_compression_report(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
    tokens_col: str | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges, APPLY them to the vocabulary,
    and report the corpus-level tokenization economics — the number a
    tokenizer-training run optimizes (chars per emitted symbol, i.e.
    compression; a merge only earns its vocab slot if it moves this).

    Everything after the one corpus-sized word count runs on the
    vocabulary; the occurrence-weighted sums (cnt-weighted chars /
    symbols) recover corpus totals from vocabulary-sized data.

    Output (1 row): (n_merges, n_distinct_words, total_words,
    total_chars, total_symbols, compression) — compression =
    total_chars / total_symbols rounded 6dp; with 0 merges it is
    exactly 1.0 and grows as merges land.
    """
    n_applied, words = _learn_merges(df, text_col, n_merges, tokens_col)
    syms = F.filter(F.split(F.col("sym"), r"\|"), lambda x: x != "")
    per_word = words.select(
        "cnt",
        F.length("word").alias("_chars"),
        F.size(syms).alias("_syms"),
    )
    return per_word.agg(
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.sum("cnt").alias("total_words"),
        F.sum(F.col("_chars") * F.col("cnt")).alias("total_chars"),
        F.sum(F.col("_syms") * F.col("cnt")).alias("total_symbols"),
    ).select(
        F.lit(len(n_applied)).alias("n_merges"),
        "n_distinct_words",
        "total_words",
        "total_chars",
        "total_symbols",
        F.round(
            F.col("total_chars") / F.col("total_symbols").cast("double"), 6
        ).alias("compression"),
    )
