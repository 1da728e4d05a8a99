"""Event-stream operators, batch form (SURVEY §7.2 step 8).

Tumbling/sliding windows and sessionization over the events table.
Batch-first: the same logic re-expressed over readStream lives in
streaming/. All arithmetic is on unix microseconds (exact integers) so
SQL oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ursa_major_choir_etl_spark.functions.columns import cast_ntz_to_timestamp


def tumbling_window_agg(
    events: DataFrame, ts_col: str = "ts", unit: str = "hour"
) -> DataFrame:
    """Tumbling window (count, sum(value)) per (window_start, event_type)."""
    return (
        events.groupBy(
            F.date_trunc(unit, F.col(ts_col)).cast("string").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def sliding_window_agg(
    events: DataFrame, ts_col: str = "ts", hours: int = 2
) -> DataFrame:
    """Sliding window (len=``hours``h, slide=1h): each event lands in
    ``hours`` buckets. Expressed as an explode over the covering hour
    starts (identical algebra to Spark's window(ts, '2 hours', '1 hour'),
    but portable to the SQL oracle)."""
    starts = F.array(
        *[
            F.date_trunc("hour", F.col(ts_col)) - F.expr(f"INTERVAL {h} HOUR")
            for h in range(hours)
        ]
    )
    return (
        events.withColumn("window_start", F.explode(starts))
        .groupBy(F.col("window_start").cast("string").alias("window_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_minutes``.

    Classic lag + running-sum windows, partitioned by user — the 100 TB
    shape (state never leaves the user partition).
    Output per session: user_id, session_id (ordinal), n_events,
    session_secs (truncated to the millisecond: integer-micros
    duration DIV 1000, then /1000.0 — deterministic across engines,
    no float round() whose tie-breaking could differ).
    """
    # Robustness to TIMESTAMP_NTZ inputs (tz-naive parquet under
    # inferTimestampNTZ): cast_ntz_to_timestamp verifies the session tz
    # is UTC — where the NTZ->LTZ cast preserves integer micros exactly
    # — and RAISES under any other tz rather than silently shifting
    # session boundaries. No-op for TIMESTAMP inputs.
    events = cast_ntz_to_timestamp(events, [ts_col])
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    new_session = F.when(
        (us - F.lag(us).over(w)).isNull() | ((us - F.lag(us).over(w)) > gap_us), 1
    ).otherwise(0)
    with_session = events.withColumn(
        "session_id", F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    _dur = F.max(us) - F.min(us)
    return (
        with_session.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            # integer micros -> whole millis (exact long arithmetic),
            # then ONE correctly-rounded float division: both engines
            # divide the same integer by the same power of ten.
            (
                (_dur - _dur % F.lit(1000)) / F.lit(1_000_000.0)
            ).alias("session_secs"),
        )
    )


def trailing_streak(
    events: DataFrame,
    match_type: str = "error",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """W2-pattern trailing streak: per user, how many consecutive most
    recent events are of ``match_type`` (stop at first other event).
    Only users with a streak >= 1 are emitted.

    Same gaps-and-islands shape as the choir alert engine
    (operators/analytics.py) — re-targeted at the events table.
    """
    w_desc = Window.partitionBy(user_col).orderBy(F.col(ts_col).desc())
    w_all = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ranked = events.withColumn("rn", F.row_number().over(w_desc)).withColumn(
        "first_break",
        F.min(F.when(F.col("event_type") != match_type, F.col("rn"))).over(w_all),
    )
    return (
        ranked.filter(F.col("first_break").isNull() | (F.col("rn") < F.col("first_break")))
        .groupBy(user_col)
        .agg(F.count("*").alias("streak_len"))
    )


def asof_prior_event(
    left: DataFrame,
    right: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """As-of join (J2 pattern, generic): for each left event, the most
    recent right event of the same user with right.ts <= left.ts.

    Equi-join on user + range predicate + max_by — the same plan shape
    as the choir as-of assignment join, keyed on the natural partition
    column so the shuffle is on user_id only.
    """
    l = left.select(
        F.col("event_id").alias("event_id"),
        F.col(user_col).alias(user_col),
        F.col(ts_col).alias("_lts"),
    )
    r = right.select(
        F.col(user_col).alias(user_col),
        F.col("event_id").alias("_r_event_id"),
        F.col(ts_col).alias("_rts"),
    )
    joined = l.join(r, on=user_col, how="left").filter(
        F.col("_rts").isNull() | (F.col("_rts") <= F.col("_lts"))
    )
    # The filter can drop all right rows for an event; re-attach via
    # group on the left key (max_by keeps the latest prior).
    agg = joined.groupBy("event_id", user_col, "_lts").agg(
        F.max_by("_r_event_id", "_rts").alias("prior_event_id"),
        F.max("_rts").alias("prior_ts"),
    )
    out = l.join(agg.select("event_id", "prior_event_id", "prior_ts"), on="event_id", how="left")
    return out.select(
        "event_id",
        user_col,
        F.col("_lts").cast("string").alias("ts"),
        "prior_event_id",
        F.col("prior_ts").cast("string").alias("prior_ts"),
    )


def turn_budget_assembly(
    events: DataFrame,
    budget_tokens: int = 128,
    gap_minutes: int = 30,
    overhead_tokens: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    payload_col: str = "props",
) -> DataFrame:
    """Chat-context assembly under a token budget: sessionize an
    event stream into conversations (same gap rule as
    :func:`sessionize`) and, per conversation, keep the longest
    SUFFIX of turns that fits ``budget_tokens`` — the drop-oldest
    truncation every chat-format SFT/serving pipeline applies before
    rendering a context window.

    A turn costs pieces(type + ' ' + payload) + ``overhead_tokens``
    (the template's role/markup tokens) — the house BPE-ish piece
    count, one regex pass, no tokenizer library. Costs are positive,
    so the newest-first running sum is monotone and "kept" is exactly
    "reverse-cumulative cost <= budget".

    Scale shape: three windows, every one partitioned by user (state
    never leaves the user partition, the streaming-parity layout):
    lag for session starts, a forward running sum for session ids,
    a newest-first running sum for the suffix rule; then one
    (user, session)-grain aggregate. Ordering ties break on the
    event id, so both engines walk identical sequences.

    Output per conversation: (user_id, session_id, n_turns, n_kept,
    tokens_total, tokens_kept, truncated).
    """
    from ursa_major_choir_etl_spark.functions.columns import (
        cast_ntz_to_timestamp,
    )
    from ursa_major_choir_etl_spark.operators.text import (
        bpe_ish_piece_count,
    )

    events = cast_ntz_to_timestamp(events, [ts_col])
    cost = (
        bpe_ish_piece_count(
            F.concat_ws(
                " ", F.col(type_col), F.coalesce(payload_col, F.lit(""))
            )
        ).cast("bigint")
        + overhead_tokens
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    fwd = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = gap_minutes * 60 * 1_000_000
    new_session = F.when(
        (us - F.lag(us).over(fwd)).isNull()
        | ((us - F.lag(us).over(fwd)) > gap_us),
        1,
    ).otherwise(0)
    turns = events.select(
        F.col(user_col), F.col(ts_col), F.col(id_col), cost.alias("_cost")
    ).withColumn(
        "session_id",
        F.sum(new_session).over(
            fwd.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    rev = (
        Window.partitionBy(user_col, "session_id")
        .orderBy(F.col(ts_col).desc(), F.col(id_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = turns.withColumn(
        "_kept", (F.sum("_cost").over(rev) <= budget_tokens).cast("bigint")
    )
    return (
        flagged.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("_kept").alias("n_kept"),
            F.sum("_cost").alias("tokens_total"),
            F.sum(F.col("_kept") * F.col("_cost")).alias("tokens_kept"),
            (F.count(F.lit(1)) > F.sum("_kept"))
            .cast("bigint")
            .alias("truncated"),
        )
    )


def rfm_segments(
    events: DataFrame,
    purchase_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """RFM-style behavioural segmentation: per user, Recency (days
    since last event, vs the corpus max timestamp), Frequency (event
    count) and Monetary proxy (purchase-event count) are each scored
    into exact quartiles 1-4, and the report counts users per
    (r_q, f_q, m_q) cell — the classic lifecycle segmentation
    (champions / at-risk / hibernating) every activity warehouse
    publishes.

    Quartiles are EXACT under ties and engine-portable: each
    dimension's quartile comes from its integer VALUE HISTOGRAM over
    the per-user table — quartile = min((2*cum - cnt - 1) * 4 DIV
    (2*n), 3) + 1 on the average double-rank (the q150 machinery), so
    windows only ever run over histogram rows and every division is
    integer. Recency uses integer epoch-microsecond arithmetic
    (micros DIV 86_400_000_000), never calendar float math.

    Scale shape: one event scan -> per-user aggregate (the only
    corpus-sized shuffle); three histogram builds + probe joins on
    the user-cardinality table; a broadcast 1-row corpus max
    timestamp; one final segment-cardinality aggregate.

    Output per segment: (r_q, f_q, m_q, n_users, total_events) —
    r_q 4 = most recently active (smallest recency-days).
    """
    from ursa_major_choir_etl_spark.functions.columns import (
        cast_ntz_to_timestamp,
    )

    from ursa_major_choir_etl_spark.caching import stage
    from ursa_major_choir_etl_spark.operators.prefix import bucketed_cumsum

    events = cast_ntz_to_timestamp(events, [ts_col])
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # Staged ONCE: the corpus scan + per-user aggregate feeds the ref
    # broadcast, the melted histogram build, AND the final probe
    # joins — without the stage each branch re-evaluates the whole
    # upstream (measured 10x warm cost when the quartile branches
    # chained, round 9).
    per_user = stage(
        events.groupBy(F.col(user_col).alias("u")).agg(
            F.max(us).alias("_last_us"),
            F.count(F.lit(1)).alias("_freq"),
            F.sum(
                (F.col(type_col) == purchase_type).cast("bigint")
            ).alias("_mon"),
        )
    )
    ref = per_user.agg(F.max("_last_us").alias("_ref_us"))
    scored = per_user.crossJoin(F.broadcast(ref)).select(
        "u",
        # negate so that quartile 4 (highest value bucket) = most
        # recent, matching the f/m orientation ("more is better");
        # integer DIV on epoch micros — no float calendar math
        F.expr("-((_ref_us - _last_us) DIV 86400000000)").alias("r"),
        F.col("_freq").alias("f"),
        F.col("_mon").alias("m"),
    )

    # All three quartile maps in ONE pass: melt (dim, value), build
    # the per-dim value histogram with one shuffle, run the grouped
    # two-level prefix scan (boundaries per dim, windows partitioned
    # by (dim, bucket) — frequency / purchase-count histograms grow
    # with the heaviest user, so even the histogram cumulative must
    # avoid a global window; round-8 verdict's allowlist audit), and
    # probe each dimension from the same staged map.
    melted = scored.selectExpr(
        "stack(3, 'r', r, 'f', f, 'm', m) AS (dim, _v)"
    )
    h = melted.groupBy("dim", "_v").agg(F.count(F.lit(1)).alias("_cnt"))
    n = h.groupBy("dim").agg(F.sum("_cnt").alias("_n"))
    hc = bucketed_cumsum(
        h, "_v", {"_cum": F.col("_cnt")}, group_cols=["dim"]
    ).join(F.broadcast(n), "dim")  # 3 total rows: one per dimension
    qmap = stage(
        hc.select(
            "dim",
            "_v",
            (
                F.least(
                    F.expr("(2 * _cum - _cnt - 1) * 4 DIV (2 * _n)"),
                    F.lit(3),
                )
                + 1
            ).alias("_q"),
        )
    )  # probed three times below

    def quartile_map(col: str, out: str) -> DataFrame:
        return qmap.filter(F.col("dim") == col).select(
            F.col("_v").alias(col), F.col("_q").alias(out)
        )

    out = (
        scored.join(quartile_map("r", "r_q"), "r")
        .join(quartile_map("f", "f_q"), "f")
        .join(quartile_map("m", "m_q"), "m")
    )
    return (
        out.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("f").alias("total_events"),
        )
    )


def seasonal_baseline_report(
    events: DataFrame,
    season_lag_hours: int = 24,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Forecast-baseline evaluation for traffic monitoring: per event
    type, compare the two standard anomaly-detection baselines —
    seasonal-naive (this hour yesterday) and persistence (the
    previous hour) — by mean absolute error over the hourly count
    series. The winner tells an alerting pipeline which baseline's
    residuals to threshold; a strong seasonal win is also direct
    evidence of daily periodicity.

    The hourly series is DENSIFIED first (sequence over the type's
    [min_hour, max_hour] epoch-hour range, missing hours = 0) so lags
    are true time shifts, not row shifts across gaps. Hours are
    integer epoch-hours (micros DIV 3600e6) and counts integers, so
    every error is exact; only absolute-error SUMS are emitted
    (consumers divide).

    Scale shape: one event scan -> (type, hour) count aggregate; the
    densified series and its windows are bounded by type-count x
    hours-of-history, never event-cardinality. Output per type:
    (event_type, n_hours, n_scored, sae_seasonal, sae_persist,
    seasonal_wins).
    """
    from ursa_major_choir_etl_spark.functions.columns import (
        cast_ntz_to_timestamp,
    )

    events = cast_ntz_to_timestamp(events, [ts_col])
    hour = F.expr(
        f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV 3600000000"
    )
    counts = events.groupBy(
        F.col(type_col).alias("etype"), hour.alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    spans = counts.groupBy("etype").agg(
        F.min("h").alias("_h0"), F.max("h").alias("_h1")
    )
    dense = (
        spans.select(
            "etype", F.explode(F.sequence("_h0", "_h1")).alias("h")
        )
        .join(counts, ["etype", "h"], "left")
        .select("etype", "h", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w = Window.partitionBy("etype").orderBy("h")
    lagged = dense.select(
        "etype",
        "c",
        F.lag("c", season_lag_hours).over(w).alias("_s"),
        F.lag("c", 1).over(w).alias("_p"),
    )
    scored = lagged.withColumn(
        "_ok", (F.col("_s").isNotNull() & F.col("_p").isNotNull())
    )
    return scored.groupBy(F.col("etype").alias(type_col)).agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum(F.col("_ok").cast("bigint")).alias("n_scored"),
        F.sum(
            F.when(F.col("_ok"), F.abs(F.col("c") - F.col("_s"))).otherwise(0)
        ).alias("sae_seasonal"),
        F.sum(
            F.when(F.col("_ok"), F.abs(F.col("c") - F.col("_p"))).otherwise(0)
        ).alias("sae_persist"),
        (
            F.sum(
                F.when(F.col("_ok"), F.abs(F.col("c") - F.col("_s"))).otherwise(
                    0
                )
            )
            < F.sum(
                F.when(F.col("_ok"), F.abs(F.col("c") - F.col("_p"))).otherwise(
                    0
                )
            )
        )
        .cast("bigint")
        .alias("seasonal_wins"),
    )


def markov_transition_profile(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition profile of the event stream:
    per (state -> next state) within a user's ordered sequence, the
    transition count and row-normalized probability in integer ppm —
    the behavioural fingerprint (what follows a view? does error
    self-loop?) that feeds session simulation and anomaly scoring.

    One lag/lead window partitioned by user (state never leaves the
    user partition), one (state, next)-cardinality count — states^2
    output rows. Ordering ties break on the event id; the terminal
    event of each user has no successor and is excluded (transition
    semantics, not padding).

    Output: (state, next_state, n_transitions, prob_ppm) with
    prob_ppm = transitions * 1e6 DIV row total for the state.
    """
    from ursa_major_choir_etl_spark.functions.columns import (
        cast_ntz_to_timestamp,
    )

    events = cast_ntz_to_timestamp(events, [ts_col])
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("state"),
            F.lead(type_col).over(w).alias("next_state"),
        )
        .filter(F.col("next_state").isNotNull())
        .groupBy("state", "next_state")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = pairs.groupBy("state").agg(
        F.sum("n_transitions").alias("_row_total")
    )
    return pairs.join(totals, "state").select(
        "state",
        "next_state",
        "n_transitions",
        F.expr(
            "CAST(CAST(n_transitions AS DECIMAL(38,0)) * 1000000"
            " DIV _row_total AS BIGINT)"
        ).alias("prob_ppm"),
    )


def conversion_hazard_report(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-to-conversion hazard profile: for users whose FIRST
    ``from_type`` event is eventually followed by a ``to_type``
    event, the latency distribution in integer log2-second buckets,
    plus the never-converted population — the funnel's time dimension
    (q57 counts stages; this says how long the step takes and how
    the hazard decays).

    Latency = first to_type at-or-after the first from_type, in
    whole seconds (integer micros DIV 1e6); bucket = length(bin(s+1))
    - 1 (house integer floor-log2, so bucket b spans [2^b - 1,
    2^(b+1) - 2] seconds — exact cross-engine, no libm). One per-user
    aggregate (min timestamps via conditional min) is the only
    corpus-sized shuffle; the report is bucket-cardinality.

    Output: (latency_bucket, n_users, users_ppm) with bucket -1 for
    never-converted users (no to_type at-or-after the first
    from_type).
    """
    from ursa_major_choir_etl_spark.functions.columns import (
        cast_ntz_to_timestamp,
    )

    events = cast_ntz_to_timestamp(events, [ts_col])
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_user = (
        events.groupBy(user_col)
        .agg(
            F.min(
                F.when(F.col("event_type") == from_type, us)
            ).alias("_first_from"),
        )
        .filter(F.col("_first_from").isNotNull())
    )
    conv = (
        events.select(
            F.col(user_col), F.col("event_type"), us.alias("_us")
        )
        .join(per_user, user_col)
        .filter(
            (F.col("event_type") == to_type)
            & (F.col("_us") >= F.col("_first_from"))
        )
        .groupBy(user_col)
        .agg(F.min(F.expr("(_us - _first_from) DIV 1000000")).alias("_lat_s"))
    )
    labeled = per_user.join(conv, user_col, "left").select(
        F.when(
            F.col("_lat_s").isNull(), F.lit(-1)
        )
        .otherwise(F.length(F.bin(F.col("_lat_s") + 1)) - 1)
        .cast("bigint")
        .alias("latency_bucket")
    )
    hist = labeled.groupBy("latency_bucket").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    total = hist.agg(F.sum("n_users").alias("_t"))
    return hist.crossJoin(F.broadcast(total)).select(
        "latency_bucket",
        "n_users",
        F.expr(
            "CAST(CAST(n_users AS DECIMAL(38,0)) * 1000000 DIV _t"
            " AS BIGINT)"
        ).alias("users_ppm"),
    )
