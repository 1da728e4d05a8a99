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
from ursa_major_choir_etl_spark.operators.text import widen_if_narrow


def word_vocabulary(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over lowercase ``[a-z]+`` runs — the one
    corpus-sized aggregation in BPE training; everything after runs
    on vocabulary-sized data."""
    return (
        widen_if_narrow(df)
        .select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
            ).alias("word")
        )
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


def bpe_merge_table(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a corpus.

    Per iteration: one vocabulary-sized aggregation (adjacent-pair
    weights), one 1-row collect (the argmax pair), one column-level
    ``replace`` on the staged vocabulary. The corpus-sized explode
    runs exactly once (the staged word vocabulary feeds all
    iterations); iteration i's plan chains i cheap replaces on top of
    the staged scan.

    Returns (merge_rank, left_sym, right_sym, pair_count) — one row
    per learned merge, rank 1 = first/most frequent.
    """
    spark: SparkSession = df.sparkSession
    words = stage(
        word_vocabulary(df, text_col).withColumn(
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
    return spark.createDataFrame(
        merges,
        schema="merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )
