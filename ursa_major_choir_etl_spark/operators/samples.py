"""Training-sample construction operators.

The last mile of a pretraining pipeline: turning curated documents
into model-ready (input, target) examples. Everything here is
deterministic column arithmetic (md5-nibble decisions, positional
reconstruction) so the emitted samples — actual strings, not just
counts — are value-hashable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ursa_major_choir_etl_spark.operators.dedup import bloom_position_sql
from ursa_major_choir_etl_spark.operators.text import tokens, widen_if_narrow


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 3,
    mask_pct: int = 15,
    seed: int = 0,
) -> DataFrame:
    """T5-style span corruption: partition each document's tokens
    into fixed ``span_len`` groups, deterministically mask ~
    ``mask_pct``% of groups (md5-nibble hash of (seed, id, group) —
    id-pure, so the same doc always yields the same example), and
    emit the (input, target) pair: masked groups collapse to
    ``<X_i>`` sentinels in the input; the target lists each sentinel
    followed by the tokens it hides. The denoising objective's data
    layout, produced as plain strings.

    Shape: one posexplode to (doc, pos, token), the mask decision as
    a per-row hash expression, sentinel numbering as a per-doc dense
    rank over masked groups (a PER-DOC window — bounded by document
    length, never corpus-wide), and per-doc reconstruction via
    array_sort(collect_list(struct(pos, piece))) — order restored
    explicitly, not trusted from collect_list. The oracle rebuilds
    the same strings with ORDER BY string_agg.

    Output: (id, n_tokens, n_masked, n_spans, input_text,
    target_text); docs with zero tokens are dropped.
    """
    from pyspark.sql import Window

    toked = widen_if_narrow(df).select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    g = F.col("pos") - F.pmod(F.col("pos"), span_len)  # group start pos
    h = F.expr(
        bloom_position_sql(
            seed,
            f"CAST({id_col} AS STRING) || ':' || CAST(g AS STRING)",
            nibbles=5,
        )
    )
    flagged = toked.withColumn("g", g).withColumn(
        "masked", F.pmod(h, F.lit(100)) < F.lit(mask_pct)
    )
    # Sentinel index: dense rank of the masked group among the doc's
    # masked groups (per-doc window; partition size = doc length).
    w = Window.partitionBy(id_col)
    sent = F.when(
        F.col("masked"),
        F.size(
            F.filter(
                F.array_sort(
                    F.collect_set(
                        F.when(F.col("masked"), F.col("g"))
                    ).over(w)
                ),
                lambda x: x < F.col("g"),
            )
        ),
    )
    first_of_group = F.col("pos") == F.col("g")
    marked = flagged.withColumn("sent", sent)
    in_piece = (
        F.when(~F.col("masked"), F.col("tok"))
        .when(first_of_group, F.concat(F.lit("<X_"), F.col("sent"), F.lit(">")))
        .otherwise(F.lit(""))
    )
    tgt_piece = F.when(
        F.col("masked"),
        F.when(
            first_of_group,
            F.concat(F.lit("<X_"), F.col("sent"), F.lit("> "), F.col("tok")),
        ).otherwise(F.col("tok")),
    ).otherwise(F.lit(""))
    pieces = marked.select(
        F.col(id_col),
        "pos",
        F.col("masked"),
        F.col("g"),
        in_piece.alias("ip"),
        tgt_piece.alias("tp"),
    )

    def joined(col: str):
        return F.array_join(
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col(col).alias("p")))
                    ),
                    lambda x: x.getField("p"),
                ),
                lambda x: x != "",
            ),
            " ",
        )

    return pieces.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("masked").cast("bigint")).alias("n_masked"),
        F.count_distinct(F.when(F.col("masked"), F.col("g"))).alias("n_spans"),
        joined("ip").alias("input_text"),
        joined("tp").alias("target_text"),
    )


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mid_lo_pct: int = 40,
    mid_hi_pct: int = 60,
) -> DataFrame:
    """Fill-in-the-middle (FIM) sample construction, PSM order: cut
    each document at the [mid_lo_pct%, mid_hi_pct%) token boundaries
    (integer DIV — deterministic, id-independent of partitioning)
    and emit ``<PRE> prefix <SUF> suffix <MID> middle`` — the infill
    objective's data layout, as an actual string.

    Unlike q132's hashed span selection, the cut points are pure
    positional arithmetic: zero shuffles, zero windows — the whole
    transform is per-row JVM expressions on the token array (the
    with_repetition_stats no-explode pattern), so a 100 TB corpus
    scans once and nothing else happens.

    Output: (id, n_tokens, n_prefix, n_middle, n_suffix, fim_text);
    empty docs are dropped.
    """
    toked = df.select(
        F.col(id_col), tokens(text_col).alias("_toks")
    ).filter(F.size("_toks") > 0)
    n = F.size("_toks")
    a = F.expr(f"size(_toks) * {mid_lo_pct} DIV 100")
    b = F.expr(f"size(_toks) * {mid_hi_pct} DIV 100")
    part = lambda start, length: F.array_join(  # noqa: E731
        F.slice(F.col("_toks"), start, length), " "
    )
    prefix = part(F.lit(1), a)
    middle = part(a + 1, b - a)
    suffix = part(b + 1, n - b)
    return toked.select(
        F.col(id_col),
        n.alias("n_tokens"),
        a.cast("int").alias("n_prefix"),
        (b - a).cast("int").alias("n_middle"),
        (n - b).cast("int").alias("n_suffix"),
        F.concat(
            F.lit("<PRE> "), prefix,
            F.lit(" <SUF> "), suffix,
            F.lit(" <MID> "), middle,
        ).alias("fim_text"),
    )
