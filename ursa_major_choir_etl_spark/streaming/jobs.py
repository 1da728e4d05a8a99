"""Streaming jobs: the batch event operators re-expressed on
readStream sources.

Design rules for the 100 TB/unbounded target:
- event-time windows + watermarks bound state (no unbounded
  aggregation state);
- session windows use the built-in ``session_window`` (state store
  managed, gap-based) rather than hand-rolled lag/cumsum (which
  requires a full-partition sort — fine in batch, impossible on an
  unbounded stream);
- custom stateful logic (the trailing-miss streak) uses
  ``applyInPandasWithState`` with explicit state schema + timeout.

Each job returns the writeStream-ready DataFrame; callers pick sink
and trigger. Tests drive them with a file source over the events
parquet and a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_event_stream(
    spark, path: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a parquet directory (the batch/stream
    symmetric source: same files, incremental discovery).

    Any TIMESTAMP_NTZ column (tz-naive parquet under
    inferTimestampNTZ) is cast to TIMESTAMP: watermarks and
    session_window reject NTZ on streams, and under the engine's UTC
    session tz the cast preserves micros exactly."""
    from ursa_major_choir_etl_spark.functions.columns import (
        cast_ntz_to_timestamp,
    )

    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    # UTC-guarded: raises rather than reinterpreting wall-clock if the
    # session tz was locked to something other than UTC.
    return cast_ntz_to_timestamp(df)


def streaming_tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time window counts with a watermark: late rows
    beyond the watermark are dropped and window state is reclaimed."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions on a stream via session_window — the
    streaming equivalent of operators/events.sessionize (same gap
    semantics; session boundaries close once the watermark passes)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("session_window.start").cast("string").alias("session_start"),
            F.col("session_window.end").cast("string").alias("session_end"),
            "n_events",
        )
    )


def streaming_error_streaks(
    events: DataFrame,
    match_type: str = "error",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user trailing streak of ``match_type`` events, maintained
    incrementally with applyInPandasWithState (GroupState): state is
    one (streak, last_ts) pair per user — O(users) state, not O(events).

    Batch-equivalent: operators/events.trailing_streak.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{user_col} long, streak_len long"
    state_schema = "streak long, last_ts long"

    def update(key, pdfs, state: GroupState):
        streak, last_ts = state.get if state.exists else (0, 0)
        # Concatenate the group's chunks and sort once — chunk order
        # within a micro-batch is not time-ordered.
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        for _, row in pdf.iterrows():
            ts_us = int(row[ts_col].value // 1000)
            if ts_us < last_ts:
                continue  # late event older than state: ignore
            last_ts = ts_us
            streak = streak + 1 if row["event_type"] == match_type else 0
        state.update((streak, last_ts))
        yield pd.DataFrame({user_col: [key[0]], "streak_len": [streak]})

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_documents(
    docs: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup: drop re-arrivals of the same content
    fingerprint within the watermark horizon
    (dropDuplicatesWithinWatermark — state is reclaimed as event time
    advances, so dedup state stays bounded on an unbounded stream).

    Batch-equivalent: operators.dedup.exact_duplicate_groups keeps one
    row per fingerprint; the streaming form keeps the FIRST arrival and
    suppresses later copies arriving within the watermark.
    """
    from ursa_major_choir_etl_spark.operators.text import fingerprint

    return (
        docs.withColumn("fingerprint", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_enrich(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    dim_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream
    joins against the (re-read-per-batch) static dimension. The dim is
    broadcast — no shuffle of the stream side, no state store; the
    standard pattern for attaching slowly-changing reference data
    (user profile, song catalog) to an unbounded event stream.

    Batch-equivalent: the mart lookup joins J1/J3
    (reference: etl/marts.py:145,158-163 builds a dict index and
    probes per row — same semantics, hash join per micro-batch here).
    """
    right = dim.select(on, *dim_cols) if dim_cols else dim
    return events.join(F.broadcast(right), on, how)


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join within an event-time interval: a
    right-side event matches a left-side event with the same ``key``
    if it lands in [left_ts, left_ts + max_delay] (the
    impression->click attribution shape).

    Both sides carry watermarks and the join condition bounds
    event-time in BOTH directions, so the state store can evict: a
    buffered left row is droppable once the right watermark passes
    left_ts + max_delay, and vice versa. Without the time bound the
    state grows without limit — the condition is not an optimization,
    it is what makes the join runnable on an unbounded stream.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return l.join(r, cond, "inner")


def streaming_upsert_sink(
    stream_df: DataFrame,
    warehouse: str,
    name: str,
    key_cols: list[str],
    partition_col: str | None = None,
    checkpoint_dir: str | None = None,
    seq_col: str | None = None,
):
    """Streaming CDC sink: each micro-batch MERGEs into a parquet
    table via foreachBatch + ``sources.io.merge_upsert`` — later
    arrivals for a key replace earlier rows (upsert), new keys insert.

    foreachBatch is the idempotency boundary: the checkpoint records
    the batch id, and merge_upsert is a deterministic rewrite, so a
    replayed batch converges to the same table (effectively-once).
    With ``partition_col`` each batch rewrites only the partitions it
    touches — the cost scales with the micro-batch, not the table.

    ``seq_col`` switches arrival-order semantics to LOG-ORDER
    semantics — the production CDC contract: the winner per key is
    the row with the LARGEST ``seq_col`` across everything seen so
    far (in-batch dedup keeps the max-seq row; the cross-batch merge
    compares incoming against the standing row and keeps the larger
    seq, so a late-arriving stale update can never clobber newer
    state). max() is commutative and idempotent, which makes the
    drained store independent of how the log is split into
    micro-batches AND of batch replays — the property the q291
    driver value gate certifies against a from-raw last-write-wins
    oracle. ``seq_col`` must be unique per key (a CDC log sequence /
    LSN); ties would make the winner's non-key columns ambiguous.

    Partition moves: in seq mode an update MAY change a key's
    ``partition_col`` value — the standing rows' partitions are
    passed to merge_upsert as extra touched partitions, so the old
    row is retired (and an emptied partition removed) in the same
    atomic swap. In arrival-order mode (no ``seq_col``) the touched
    set is delta-derived only, so ``partition_col`` must be stable
    per key (key-derived, the standard Hive-layout contract) — a
    moving partition value there would leave the key's old row in
    place.
    """
    from ursa_major_choir_etl_spark.sources import io as sio

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        from pyspark.sql import Window as _W

        path = _os.path.join(warehouse, name)
        if seq_col is not None:
            w = _W.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
            best = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            if not _os.path.exists(path):
                writer = best.write.mode("overwrite")
                if partition_col is not None:
                    writer = writer.partitionBy(partition_col)
                writer.parquet(path)
                return
            # Seq-compare against the standing rows: only the touched
            # keys' current rows enter the contest (broadcast semi on
            # the delta keys — delta-sized, never table-sized), then
            # merge_upsert replaces them with the per-key max-seq row.
            # standing and winners are persisted for the merge's
            # duration: winners embeds the target scan + semi join +
            # window, and merge_upsert runs three actions over it
            # (two counts + the write) — unpersisted, each would
            # re-read the standing table.
            spark = batch_df.sparkSession
            target = spark.read.parquet(path)
            standing = target.join(
                F.broadcast(best.select(*key_cols).distinct()),
                key_cols,
                "left_semi",
            ).persist()
            winners = None
            try:
                # An update may MOVE a key to a new partition value;
                # the standing rows' partitions must then join the
                # rewrite so the old row is retired (delta-sized
                # collect — one value per touched partition).
                extra = None
                if partition_col is not None:
                    extra = [
                        r[0]
                        for r in standing.select(partition_col)
                        .distinct()
                        .collect()
                    ]
                winners = (
                    standing.select(*best.columns)
                    .unionByName(best)
                    .withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn")
                ).persist()
                sio.merge_upsert(
                    spark,
                    warehouse,
                    name,
                    winners,
                    key_cols,
                    partition_col=partition_col,
                    extra_touched=extra,
                )
            finally:
                standing.unpersist()
                if winners is not None:
                    winners.unpersist()
            return
        if not _os.path.exists(path):
            writer = batch_df.write.mode("overwrite")
            if partition_col is not None:
                writer = writer.partitionBy(partition_col)
            writer.parquet(path)
            return
        # In-batch duplicates on the key: keep an arbitrary-but-
        # deterministic single row per key (last by all-column order)
        # before merging, so the merge key is unique.
        deduped = batch_df.dropDuplicates(key_cols)
        sio.merge_upsert(
            batch_df.sparkSession,
            warehouse,
            name,
            deduped,
            key_cols,
            partition_col=partition_col,
        )

    writer = stream_df.writeStream.foreachBatch(merge_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Test/debug harness: drain all available input into a memory
    sink and return the query handle."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def streaming_contaminated_grams(
    docs: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    n: int = 4,
    k_hashes: int = 3,
    nibbles: int = 5,
) -> DataFrame:
    """Streaming Bloom decontamination probe: as documents arrive,
    emit every word n-gram that hits the STATIC eval corpus's Bloom
    filter — the alert stream an ingestion pipeline tails to catch
    benchmark contamination before a doc lands in the training set.

    Shape: completely STATELESS on the stream side. The eval bit set
    (distinct int positions, batch-built once) is the static side of
    ``k_hashes`` chained broadcast LEFT SEMI joins — one per hash
    probe, a gram survives only if ALL its bits are set — so there is
    no state store, no watermark requirement, and per-micro-batch cost
    is map-side. Per-doc gram dedup is array_distinct on the row
    (stateless), not the batch operator's global distinct().

    Batch parity: running this same plan on a batch DataFrame yields
    exactly the (train_id, shingle) pairs bloom_contamination counts
    (tested). Output: (id, ts, shingle).
    """
    from ursa_major_choir_etl_spark.operators.dedup import (
        bloom_position_sql,
        shingle_array,
        word_shingles,
    )
    from ursa_major_choir_etl_spark.operators.text import normalized_text, tokens

    pos_arr = F.array(
        *[
            F.expr(bloom_position_sql(j, "shingle", nibbles))
            for j in range(k_hashes)
        ]
    )
    bits = (
        word_shingles(eval_set, id_col=id_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
        .select(F.explode(pos_arr).alias("pos"))
        .distinct()
    )
    grams = docs.select(
        F.col(id_col),
        F.col(ts_col),
        F.col(text_col),
        tokens(normalized_text(text_col)).alias("_toks"),
    ).select(
        F.col(id_col),
        F.col(ts_col),
        F.explode(F.array_distinct(shingle_array(F.col("_toks"), n))).alias(
            "shingle"
        ),
    )
    probed = grams.withColumn("_ps", pos_arr)
    for j in range(k_hashes):
        probed = probed.join(
            F.broadcast(bits),
            probed["_ps"][j] == bits["pos"],
            "leftsemi",
        )
    return probed.select(id_col, ts_col, "shingle")


def streaming_quantile_sketch_sink(
    stream_df: DataFrame,
    col: str,
    warehouse: str,
    name: str,
    checkpoint_dir: str | None = None,
):
    """Incremental quantile monitoring: each micro-batch is reduced to
    its mergeable log-histogram sketch (operators.sketches.
    log_quantile_sketch — a few hundred rows regardless of batch size)
    and written to a parquet sketch store partitioned by batch_id.
    ``read_quantile_sketch_store`` merges the store by addition, so
    any-window percentile estimates never rescan or re-sort the raw
    stream — the 100 TB monitoring shape.

    Effectively-once under replay: an ADDITIVE merge is not naturally
    idempotent, so the store keys rows by batch_id and each batch
    DYNAMIC-partition-overwrites only its own partition — a replayed
    batch replaces its previous rows instead of double-counting, and
    the checkpoint guarantees batch ids are stable.
    """

    def sketch_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        from ursa_major_choir_etl_spark.operators.sketches import (
            log_quantile_sketch,
        )

        (
            log_quantile_sketch(batch_df, col)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(_os.path.join(warehouse, name))
        )

    writer = stream_df.writeStream.foreachBatch(sketch_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_quantile_sketch_store(spark, warehouse: str, name: str) -> DataFrame:
    """Merged view of a streaming sketch store: per-batch sketch rows
    sum into the corpus sketch (the additive-merge identity, tested
    batch-side), ready for log_quantile_estimates."""
    import os as _os

    return (
        spark.read.parquet(_os.path.join(warehouse, name))
        .groupBy("bucket_lo")
        .agg(F.sum("cnt").alias("cnt"))
    )


def streaming_embedding_near_dup(
    stream_vecs: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes_per_band: int = 4,
    n_bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate detection AT INGESTION: each arriving embedding
    is sign-LSH banded (the deterministic integer planes shared with
    q24/q76) and probes the STATIC corpus's bucket index; candidates
    sharing a band bucket get an exact JVM cosine and matches above
    the threshold are emitted as (stream_id, corpus_id, cosine_sim).

    Stateless end to end: banding is an Arrow-batched narrow map
    (mapInPandas runs fine on streaming DataFrames), the probe is a
    stream-static equi-join on (band, key), and the verify is a
    column expression — no state store, no watermark. A pair that
    collides in several bands is emitted once per band (dedup is a
    downstream choice: exact dedup needs cross-batch state, which
    this alert stream deliberately avoids); self-matches are dropped.
    """
    from ursa_major_choir_etl_spark.operators.similarity import (
        banded_signatures,
        cosine,
    )

    index = banded_signatures(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        planes_per_band=planes_per_band,
        n_bands=n_bands,
        seed=seed,
    ).select(
        F.col("_id").alias("_cid"),
        F.col("_v").alias("_cv"),
        F.col("_band").alias("_cband"),
        F.col("_key").alias("_ckey"),
    )
    probes = banded_signatures(
        stream_vecs,
        id_col=id_col,
        vec_col=vec_col,
        planes_per_band=planes_per_band,
        n_bands=n_bands,
        seed=seed,
    )
    # NO hard broadcast hint: the bucket index scales with the corpus
    # (growth-class — the round-5 lesson); Spark's size threshold
    # broadcasts it while small and falls back to a shuffle join per
    # micro-batch when it isn't.
    return (
        probes.join(
            index,
            (F.col("_band") == F.col("_cband"))
            & (F.col("_key") == F.col("_ckey"))
            & (F.col("_id") != F.col("_cid")),
        )
        .withColumn("cosine_sim", F.round(cosine(F.col("_v"), F.col("_cv")), 6))
        .filter(F.col("cosine_sim") >= threshold)
        .select(
            F.col("_id").alias("stream_id"),
            F.col("_cid").alias("corpus_id"),
            "cosine_sim",
        )
    )


def streaming_cms_sink(
    stream_df: DataFrame,
    col: str,
    warehouse: str,
    name: str,
    depth: int = 4,
    width: int = 4096,
    checkpoint_dir: str | None = None,
):
    """Incremental heavy-hitter monitoring: each micro-batch reduces
    to its count-min sketch (operators.sketches.cm_sketch — at most
    depth*width cells regardless of batch size) and lands in a
    parquet sketch store partitioned by batch_id. The frequency
    sibling of streaming_quantile_sketch_sink, with the same
    replay-safety contract: an additive merge is not idempotent, so
    each batch DYNAMIC-partition-overwrites only its own batch_id
    partition — a replayed batch replaces, never double-counts.

    ``read_cms_store`` + sketches.cm_estimate answer "how often has
    value X appeared so far" over any window of batches without
    rescanning the stream.
    """

    def sketch_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        from ursa_major_choir_etl_spark.operators.sketches import cm_sketch

        (
            cm_sketch(batch_df, col, depth=depth, width=width)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(_os.path.join(warehouse, name))
        )

    writer = stream_df.writeStream.foreachBatch(sketch_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_cms_store(spark, warehouse: str, name: str) -> DataFrame:
    """Merged view of a streaming CMS store: per-batch cells sum into
    the corpus sketch (cell-wise additivity), ready for
    sketches.cm_estimate."""
    import os as _os

    return (
        spark.read.parquet(_os.path.join(warehouse, name))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def streaming_incremental_dedup(
    stream_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup AT INGESTION: every arriving document's
    normalization fingerprint probes the STATIC corpus fingerprint
    index and is emitted with its duplicate verdict — the streaming
    form of dedup.incremental_dedup_probe (q113), and the gate a
    continuous ingestion pipeline places before the write.

    Stateless: fingerprinting is a narrow column expression on the
    stream, the probe is one stream-static LEFT join against the
    index aggregate — no state store, no watermark, and the corpus
    index is the persisted artifact at scale (never rebuilt per
    batch by the planner's stream-static join contract... the index
    subtree is re-evaluated per micro-batch, so a production run
    points it at the PRE-BUILT (fingerprint, keep_id) table rather
    than the raw corpus — same contract as the q24/q76 bucket index
    in streaming_embedding_near_dup).

    Output stream: (id, fingerprint, dup_of) — dup_of NULL for fresh
    content, the smallest corpus id holding identical normalized
    content otherwise.
    """
    from ursa_major_choir_etl_spark.operators.dedup import (
        incremental_dedup_probe,
    )

    # Delegate to the batch operator: the plan is stream-static-join
    # compatible as-is, and one definition means the streaming gate
    # can never silently disagree with the q113 batch decision.
    return incremental_dedup_probe(
        stream_docs, corpus, id_col=id_col, text_col=text_col
    )


def streaming_fuzzy_dedup_sink(
    stream_docs: DataFrame,
    corpus: DataFrame,
    warehouse: str,
    name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    checkpoint_dir: str | None = None,
):
    """FUZZY dedup at ingestion: each arriving micro-batch probes the
    static corpus shingle-postings index for near-duplicate partners
    (dedup.incremental_jaccard_probe, q138) and its verdicts land in a
    parquet store partitioned by batch_id — the streaming form of the
    continuous-ingest fuzzy gate, completing the ingestion-dedup pair
    started by streaming_incremental_dedup (exact fingerprints).

    foreachBatch rather than a stream-static join: the probe
    aggregates the ARRIVING side (per-doc sorted shingle arrays),
    which the append-mode stream planner cannot express statelessly;
    per-batch delegation keeps ONE definition shared with the batch
    operator, so the gate can never silently disagree with a q138
    batch decision. Replay safety: verdicts are deterministic given
    (batch, corpus), so a replayed batch dynamic-partition-overwrites
    its own batch_id partition with identical rows. At scale the
    corpus argument is the PERSISTED postings/array index, not raw
    text — same contract as streaming_incremental_dedup.

    Store rows: (new_id, corpus_id, jaccard, batch_id).
    """

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        from ursa_major_choir_etl_spark.caching import release_staged
        from ursa_major_choir_etl_spark.operators.dedup import (
            incremental_jaccard_probe,
        )

        (
            incremental_jaccard_probe(
                batch_df,
                corpus,
                id_col=id_col,
                text_col=text_col,
                n=n,
                threshold=threshold,
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(_os.path.join(warehouse, name))
        )
        release_staged()  # the probe stages shard/corpus arrays per batch

    writer = stream_docs.writeStream.foreachBatch(probe_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_fuzzy_probe_store(spark, warehouse: str, name: str) -> DataFrame:
    """All fuzzy-dedup verdicts accumulated by
    streaming_fuzzy_dedup_sink: (new_id, corpus_id, jaccard,
    batch_id)."""
    import os as _os

    return spark.read.parquet(_os.path.join(warehouse, name))


def streaming_outlier_gate(
    stream_events: DataFrame,
    thresholds: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD outlier gating AT INGESTION: each arriving event is
    flagged against per-key robust thresholds profiled from history —
    the streaming form of quality.robust_outlier_report (q123), and
    the monitor a metric pipeline runs before admitting a batch.

    ``thresholds`` is the STATIC (key, med_value, mad_value) profile
    (e.g. q123's output persisted by the nightly job — at scale the
    pre-built table, same contract as the q113 fingerprint index).
    Stateless: one stream-static LEFT join on the key + a column
    comparison, no state store. The comparison mirrors the batch
    operator bit-for-bit: 6dp-quantized |v - med| > 6dp-quantized
    k * MAD. Keys absent from the profile pass with a NULL verdict
    (is_outlier NULL = "no baseline yet", distinct from false).

    Output stream: input columns + (med_value, mad_value,
    abs_dev, is_outlier).
    """
    from pyspark.sql import functions as F

    prof = thresholds.select(
        F.col(key_col),
        F.col("med_value"),
        F.col("mad_value"),
    )
    joined = stream_events.join(prof, key_col, "left")
    adev = F.round(F.abs(F.col(value_col) - F.col("med_value")), 6)
    return joined.select(
        "*",
        adev.alias("abs_dev"),
        (adev > F.round(F.lit(k) * F.col("mad_value"), 6)).alias(
            "is_outlier"
        ),
    )


def streaming_card_sink(
    stream_docs: DataFrame,
    warehouse: str,
    name: str,
    checkpoint_dir: str | None = None,
):
    """Incremental dataset-card monitoring: each micro-batch reduces
    to ONE mergeable card row (quality.card_batch_row — additive
    counts + HLL sketches for the distinct metrics) landed in a
    parquet store partitioned by batch_id. Same replay-safety
    contract as the CMS/quantile stores: additive merges are not
    idempotent, so each batch dynamic-partition-overwrites only its
    own batch_id — a replayed batch replaces, never double-counts.
    The corpus card at any moment is a sum + sketch-union over the
    store (read_card_store) — no rescan of the stream, ever."""
    from ursa_major_choir_etl_spark.operators.quality import card_batch_row

    def card_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        (
            card_batch_row(batch_df)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(_os.path.join(warehouse, name))
        )

    writer = stream_docs.writeStream.foreachBatch(card_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_card_store(spark, warehouse: str, name: str) -> DataFrame:
    """Merged dataset card over a streaming card store: exact sums
    for the additive metrics, HLL-union estimates for the distinct
    ones. The union merge is order- and batching-insensitive, but a
    union result and a direct single-shot sketch may differ by a few
    counts (Datasketches sparse->dense mode transitions), so the
    distinct metrics are explicitly suffixed _approx and carry the
    usual HLL error bound (~1.6%/sqrt(2^lgk/2)) — the drain test pins
    them within 5% of the exact batch truth. Output mirrors
    quality.dataset_card's tall metric table."""
    import os as _os

    merged = spark.read.parquet(_os.path.join(warehouse, name)).agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_en").alias("n_en"),
        F.sum("q_ppm_sum").alias("q_ppm_sum"),
        F.sum("n_pii").alias("n_pii"),
        F.hll_sketch_estimate(F.hll_union_agg("sources_hll"))
        .alias("n_sources_approx"),
        F.hll_sketch_estimate(F.hll_union_agg("langs_hll"))
        .alias("n_langs_approx"),
        F.hll_sketch_estimate(F.hll_union_agg("fp_hll"))
        .alias("n_distinct_fp_approx"),
    )
    nd = F.col("n_docs").cast("double")
    metrics = [
        ("n_docs", F.col("n_docs").cast("double")),
        ("n_tokens", F.col("n_tokens").cast("double")),
        ("mean_doc_tokens", F.round(F.col("n_tokens") / nd, 6)),
        ("n_sources_approx", F.col("n_sources_approx").cast("double")),
        ("n_langs_predicted_approx", F.col("n_langs_approx").cast("double")),
        ("pct_en_predicted", F.round(F.col("n_en") / nd, 6)),
        (
            "mean_quality",
            F.round(F.col("q_ppm_sum").cast("double") / (nd * 1_000_000.0), 6),
        ),
        (
            "exact_dup_rate_approx",
            F.round(1.0 - F.col("n_distinct_fp_approx") / nd, 6),
        ),
        ("pii_doc_rate", F.round(F.col("n_pii") / nd, 6)),
    ]
    from ursa_major_choir_etl_spark.operators.quality import stack_metrics

    return stack_metrics(merged, metrics)


def streaming_rollup_sink(
    stream_df: DataFrame,
    group_cols: list[str],
    value_col: str,
    warehouse: str,
    name: str,
    checkpoint_dir: str | None = None,
):
    """Streaming form of the q185 incremental-rollup pattern: each
    micro-batch reduces to MERGEABLE per-key partial state
    (n / sum / min / max over ``value_col``) and lands in a parquet
    store partitioned by batch_id — the additive-state sibling of
    streaming_cms_sink (which stores sketch cells) and the contrast
    to streaming_upsert_sink (which replaces whole rows, CDC-style).

    Replay safety: an additive merge is not idempotent, so each batch
    DYNAMIC-partition-overwrites only its own batch_id partition — a
    replayed batch replaces, never double-counts. ``read_rollup_store``
    re-aggregates partial states with the algebraic combine (sum of
    counts/sums, min of mins, max of maxes), which is bit-exact for
    integer measures — the store merged over ANY batching equals the
    single-shot batch aggregate, pinned by the drive test.

    Scale: state written per batch is keyspace-sized, not batch-sized;
    reading N batches of state is an O(N * keyspace) parquet scan with
    a map-side-combined merge.
    """

    def rollup_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        (
            batch_df.groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(value_col).alias("sum_v"),
                F.min(value_col).alias("min_v"),
                F.max(value_col).alias("max_v"),
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(_os.path.join(warehouse, name))
        )

    writer = stream_df.writeStream.foreachBatch(rollup_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_rollup_store(
    spark, warehouse: str, name: str, group_cols: list[str]
) -> DataFrame:
    """Merged rollup over a streaming rollup store: the algebraic
    combine of the per-batch partial states."""
    import os as _os

    return (
        spark.read.parquet(_os.path.join(warehouse, name))
        .groupBy(*group_cols)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def streaming_decayed_engagement_sink(
    stream_df: DataFrame,
    warehouse: str,
    name: str,
    checkpoint_dir: str | None = None,
):
    """Streaming form of q207's half-life engagement score: each
    micro-batch reduces events to per-(event_type, epoch_week) cents
    sums — TIME-BUCKETED additive state. Exponential decay is applied
    at READ time (``read_decayed_engagement``) by integer power-of-two
    division against the store's max week, so the state itself never
    needs rewriting as time passes — the standard trick that makes
    decayed counters maintainable incrementally: a week bucket's
    weight changes, its stored sum never does.

    Same replay contract as streaming_rollup_sink: per-batch dynamic
    partition overwrite keyed by batch_id; state per batch is
    (types x weeks)-sized, not batch-sized."""

    def engagement_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        (
            batch_df.select(
                "event_type",
                F.expr(
                    "unix_micros(ts) DIV 604800000000"
                ).alias("epoch_week"),
                F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
            )
            .groupBy("event_type", "epoch_week")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("sum_cents"),
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(_os.path.join(warehouse, name))
        )

    writer = stream_df.writeStream.foreachBatch(engagement_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_decayed_engagement(spark, warehouse: str, name: str) -> DataFrame:
    """Merged + decayed view over a streaming engagement store: week
    buckets combine additively across batches, then each bucket is
    halved once per week of age against the store's max week (integer
    ``1 << age`` division, capped at 40 — q207's exact arithmetic).
    Output per event_type: (n_events, raw_cents, decayed_cents,
    retention_ppm). Ages are quantized to EPOCH-WEEK BUCKETS (the
    price of never rewriting state): bit-equal to a single-shot batch
    computation that uses the same bucket ages — the drive test pins
    that equality — but up to one halving apart from q207, whose age
    is measured from the exact max timestamp."""
    import os as _os

    weekly = (
        spark.read.parquet(_os.path.join(warehouse, name))
        .groupBy("event_type", "epoch_week")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
        )
    )
    anchor = weekly.agg(F.max("epoch_week").alias("_aw"))
    return (
        weekly.crossJoin(F.broadcast(anchor))
        .withColumn(
            "decayed",
            F.expr(
                "sum_cents DIV shiftleft(CAST(1 AS BIGINT),"
                " least(CAST(_aw - epoch_week AS INT), 40))"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sum_cents").alias("raw_cents"),
            F.sum("decayed").alias("decayed_cents"),
        )
        .withColumn(
            "retention_ppm",
            F.expr(
                "CASE WHEN raw_cents > 0 THEN CAST("
                " CAST(decayed_cents AS DECIMAL(38,0)) * 1000000"
                " DIV raw_cents AS BIGINT) END"
            ),
        )
    )


def _hadoop_path_exists(spark, path: str) -> bool:
    """Existence check through the JVM Hadoop FileSystem resolved FOR
    the path's own scheme (hdfs:/s3a:/file:/bare-local all work) —
    the filesystem Spark itself would read through. Distinguishes
    "store not created yet" (False — the only state a label reader
    may treat as empty) from a real read problem, which spark.read
    then surfaces on its own."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(hconf).exists(hpath)


def _read_store_parquet(spark, path: str, row_schema: str) -> DataFrame:
    """spark.read.parquet for a generation store, with ONE narrowed
    degradation: a store directory that exists but holds ZERO data
    files raises UNABLE_TO_INFER_SCHEMA — and that state arises
    legitimately: a micro-batch whose merged output is empty (e.g.
    an all-filtered first batch) dynamic-partition-writes no
    partition directories at all, leaving just the bare store dir.
    That is "no generations yet", the same as path-absent, so it
    resolves to an empty frame carrying ``row_schema`` PLUS the gen
    partition column (downstream before_gen filters and max(gen)
    must still analyze). Any other analysis/read error (corrupt
    files included) PROPAGATES — the history-erasure rule stands."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        if "UNABLE_TO_INFER_SCHEMA" in str(exc):
            return spark.createDataFrame([], f"{row_schema}, gen long")
        raise


def _prune_generations(spark, path: str, batch_id: int) -> None:
    """Drop superseded generation partitions of a gen-partitioned
    store — EXCEPT the one this batch just consumed. If the job dies
    between the parquet publish and the streaming checkpoint commit,
    the replayed batch reads generations < batch_id again; deleting
    its input here would leave that view empty and the replay would
    silently rebuild state from the current batch alone (round-9
    ADVICE, high). Keeping the predecessor makes the publish+prune
    pair crash-safe at the cost of one extra compacted generation on
    disk; older generations are only readable by batches that already
    committed, so they are safe to drop. Best-effort — readers only
    ever take max(gen), a failed prune costs disk, never correctness.
    Skips anything that is not literally gen=<int> (e.g. a Hive
    default-partition dir) so a stray entry can never fail a batch
    AFTER a successful publish (round-10 ADVICE).

    Listing and deletion route through the Hadoop FileSystem resolved
    for the store path's own scheme — the same handle the existence
    probe uses (round-11 ADVICE: the os.listdir/shutil version
    silently skipped pruning on every non-local warehouse, so remote
    stores accumulated generations until an external janitor ran)."""

    def _gen_of(entry: str) -> int | None:
        if not entry.startswith("gen="):
            return None
        try:
            return int(entry[4:])
        except ValueError:
            return None

    try:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(hconf)
        entries = {}
        for st in fs.listStatus(hpath):
            g = _gen_of(st.getPath().getName())
            if g is not None:
                entries[st.getPath()] = g
        prior = [g for g in entries.values() if g < batch_id]
        keep = {batch_id}
        if prior:
            keep.add(max(prior))  # generation this batch consumed
        for jpath, g in entries.items():
            if g not in keep:
                fs.delete(jpath, True)  # recursive
    except Exception:  # noqa: BLE001 — best-effort by contract
        pass


def streaming_cc_label_sink(
    stream_pairs: DataFrame,
    warehouse: str,
    name: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    checkpoint_dir: str | None = None,
):
    """Streaming cluster-label maintenance: each micro-batch of newly
    discovered near-dup pairs (e.g. the fuzzy probe sink's verdicts)
    is folded into the persisted (node, component) label table via
    ``dedup.merge_cc_labels`` — the closure never re-runs over
    historical pairs, completing the continuous-ingest dedup chain
    (exact fingerprint gate -> fuzzy pair probe -> live cluster
    labels).

    Store layout: one generation per micro-batch, parquet partitioned
    by ``gen`` (= batch_id); readers take the max generation. Replay
    safety is structural twice over: a replayed batch reads only
    generations BELOW its own id (its own half-written output is
    invisible to the merge) and dynamic-partition-overwrites its own
    ``gen`` partition; and the merge itself is idempotent — pairs
    already inside one component are no-ops, so even a double-applied
    batch yields byte-identical labels.

    At 100 TB each generation rewrites the compacted label table
    (one row per ever-labeled node) — that is label COMPACTION, the
    cost a production pipeline pays per ingest cycle (availableNow
    per shard drop, not per-second triggers), in exchange for every
    downstream report staying a single parquet scan. Superseded
    generations are pruned after each successful publish."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        from ursa_major_choir_etl_spark.operators.dedup import merge_cc_labels

        spark_l = batch_df.sparkSession
        path = _os.path.join(warehouse, name)
        prev = read_cc_label_store(
            spark_l, warehouse, name, before_gen=int(batch_id)
        )
        merged = merge_cc_labels(
            prev, batch_df.select(F.col(id_a), F.col(id_b))
        )
        (
            merged.withColumn("gen", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("gen")
            .parquet(path)
        )
        # Prune superseded generations — EXCEPT the one this batch
        # just consumed — see _prune_generations.
        _prune_generations(spark_l, path, int(batch_id))

    writer = stream_pairs.writeStream.foreachBatch(merge_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_cc_label_store(
    spark, warehouse: str, name: str, before_gen: int | None = None
) -> DataFrame:
    """Current cluster labels accumulated by streaming_cc_label_sink:
    (node, component) rows of the newest generation (optionally the
    newest BELOW ``before_gen`` — the replay-safe view a merging batch
    reads). Missing/empty store -> empty frame with the label
    schema."""
    import os as _os

    row_schema = "node long, component long"
    empty = spark.createDataFrame([], row_schema)
    path = _os.path.join(warehouse, name)
    # "Store not created yet" is the ONLY state that may read as
    # empty labels. A transient read failure (permissions, corrupt
    # footer) must propagate and fail the batch — swallowing it here
    # would let the merge proceed from empty labels and publish a new
    # max generation that permanently erases history (round-9 ADVICE,
    # medium). Existence resolves through the Hadoop FileSystem API,
    # not os.path — an hdfs:/s3a:/file: warehouse would make a local
    # stat always-False and silently read the store as empty, the
    # exact history-erasing mode this gate closes (round-10 ADVICE).
    if not _hadoop_path_exists(spark, path):
        return empty
    df = _read_store_parquet(spark, path, row_schema)
    if before_gen is not None:
        df = df.filter(F.col("gen") < before_gen)
    mx = df.agg(F.max("gen")).first()[0]
    if mx is None:
        return empty
    return df.filter(F.col("gen") == mx).select("node", "component")


def streaming_hll_register_sink(
    stream: DataFrame,
    warehouse: str,
    name: str,
    group_col: str = "source",
    value_col: str = "token",
    checkpoint_dir: str | None = None,
):
    """Streaming distinct-cardinality maintenance with the PORTABLE
    HLL sketch (operators.sketches.portable_hll_registers): each
    micro-batch's (group, value) rows become md5 registers that
    MAX-merge into the persisted register store — the whole point of
    an HLL is that this merge is lossless and order-free, so the
    store after any replay/reorder of batches is byte-identical to a
    batch rebuild (the property the parity test pins). The live store
    answers per-group distinct estimates and the q265 overlap matrix
    without ever re-reading history.

    Store layout mirrors the CC label store: one generation per
    micro-batch partitioned by ``gen``; readers take max(gen); a
    replayed batch reads only generations BELOW its own id and
    overwrites its own partition, and MAX-merge makes double-apply a
    no-op. Each generation rewrites groups x <=256 rows — register
    compaction, constant in corpus size."""
    from ursa_major_choir_etl_spark.operators.sketches import (
        portable_hll_registers,
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        spark_l = batch_df.sparkSession
        path = _os.path.join(warehouse, name)
        prev = read_hll_register_store(
            spark_l, warehouse, name, before_gen=int(batch_id)
        )
        fresh = portable_hll_registers(
            batch_df, group_col, value_col
        ).select(
            F.col("_g").alias("grp"),
            F.col("_bkt").alias("bkt"),
            F.col("_r").alias("r"),
        )
        merged = (
            prev.unionByName(fresh)
            .groupBy("grp", "bkt")
            .agg(F.max("r").alias("r"))
        )
        (
            merged.withColumn("gen", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("gen")
            .parquet(path)
        )
        _prune_generations(spark_l, path, int(batch_id))

    writer = stream.writeStream.foreachBatch(merge_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_hll_register_store(
    spark, warehouse: str, name: str, before_gen: int | None = None
) -> DataFrame:
    """Current (grp, bkt, r) registers accumulated by
    streaming_hll_register_sink — newest generation, optionally the
    newest BELOW ``before_gen`` (the replay-safe merge view). Missing
    store -> empty registers; real read failures propagate (the
    history-erasure rule the CC label reader documents)."""
    import os as _os

    row_schema = "grp string, bkt int, r int"
    empty = spark.createDataFrame([], row_schema)
    path = _os.path.join(warehouse, name)
    if not _hadoop_path_exists(spark, path):
        return empty
    df = _read_store_parquet(spark, path, row_schema)
    if before_gen is not None:
        df = df.filter(F.col("gen") < before_gen)
    mx = df.agg(F.max("gen")).first()[0]
    if mx is None:
        return empty
    return df.filter(F.col("gen") == mx).select("grp", "bkt", "r")


def hll_store_estimates(regs: DataFrame) -> DataFrame:
    """Per-group distinct estimates from a (grp, bkt, r) register
    store — the integer HLL formula shared with the q265 overlap
    matrix. Output: (grp, est_distinct)."""
    from ursa_major_choir_etl_spark.operators.sketches import (
        _hll_estimate_expr,
    )

    term = F.expr("CAST(shiftleft(1L, 57 - r) AS DECIMAL(38,0))")
    return (
        regs.withColumn("_t", term)
        .groupBy("grp")
        .agg(F.sum("_t").alias("_ssum"), F.count(F.lit(1)).alias("_nbk"))
        .select(
            "grp",
            F.expr(
                f"CAST({_hll_estimate_expr()} AS BIGINT)"
            ).alias("est_distinct"),
        )
    )


def streaming_presence_bitmap_sink(
    stream: DataFrame,
    warehouse: str,
    name: str,
    key_col: str = "k",
    position_col: str = "pos",
    checkpoint_dir: str | None = None,
):
    """Streaming maintenance of presence bitmaps
    (operators/bitmaps.py): each micro-batch's (key, position) rows
    pack into per-key BIGINT day-set words that OR-merge into the
    persisted store. Like the HLL register store above, the merge is
    lossless and order-free (OR is idempotent, commutative,
    associative), so the store after any replay or reorder of batches
    is byte-identical to a one-shot batch pack — the parity the test
    pins — and double-applying a replayed batch is a no-op.

    Store layout: the generation-per-micro-batch scheme shared with
    the CC-label and HLL stores (readers take max(gen); a replayed
    batch merges only generations BELOW its own id and overwrites its
    own partition). Each generation rewrites one row per ACTIVE key —
    entity-cardinality, constant in event volume. Positions outside
    [0, 62] are excluded (the bitmaps module's signed-word domain
    cap)."""
    from ursa_major_choir_etl_spark.operators.bitmaps import MAX_POSITION

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        spark_l = batch_df.sparkSession
        path = _os.path.join(warehouse, name)
        prev = read_presence_bitmap_store(
            spark_l,
            warehouse,
            name,
            before_gen=int(batch_id),
            key_type=batch_df.schema[key_col].dataType.simpleString(),
        )
        pos = F.col(position_col)
        fresh = (
            batch_df.filter((pos >= 0) & (pos <= MAX_POSITION))
            .groupBy(F.col(key_col).alias("k"))
            .agg(
                F.expr(
                    f"bit_or(shiftleft(CAST(1 AS BIGINT), {position_col}))"
                ).alias("bitmap")
            )
        )
        merged = (
            prev.unionByName(fresh)
            .groupBy("k")
            .agg(F.expr("bit_or(bitmap)").alias("bitmap"))
        )
        (
            merged.withColumn("gen", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("gen")
            .parquet(path)
        )
        _prune_generations(spark_l, path, int(batch_id))

    writer = stream.writeStream.foreachBatch(merge_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_presence_bitmap_store(
    spark,
    warehouse: str,
    name: str,
    before_gen: int | None = None,
    key_type: str = "string",
) -> DataFrame:
    """Current (k, bitmap) rows accumulated by
    streaming_presence_bitmap_sink — newest generation, optionally
    the newest BELOW ``before_gen`` (the replay-safe merge view).
    Missing store -> empty; real read failures propagate (the
    history-erasure rule the CC label reader documents).

    ``key_type`` sets the key column type of the empty frame a
    missing store resolves to. The sink passes the stream's own key
    type here, so a non-string-keyed store's FIRST batch unions
    against a matching empty frame instead of silently coercing its
    keys to string (round-11 ADVICE) — batch-pack parity then holds
    for any key type. An existing store reads with its stored key
    type regardless."""
    import os as _os

    row_schema = f"k {key_type}, bitmap long"
    empty = spark.createDataFrame([], row_schema)
    path = _os.path.join(warehouse, name)
    if not _hadoop_path_exists(spark, path):
        return empty
    df = _read_store_parquet(spark, path, row_schema)
    if before_gen is not None:
        df = df.filter(F.col("gen") < before_gen)
    mx = df.agg(F.max("gen")).first()[0]
    if mx is None:
        return empty
    return df.filter(F.col("gen") == mx).select("k", "bitmap")
