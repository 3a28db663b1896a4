"""Event/entity analytics operators: funnel conversion, cohort
retention, SCD2 history construction.

The reference has no analytics surface at all (SURVEY.md §2d/§2f mark
every aggregation/window category ABSENT); these are the standard
product-analytics operators an engine with an events table is expected
to serve, built to hold at 100 TB:

- every operator shuffles AT MOST once per distinct partitioning key
  (consecutive Window specs over the same partitionBy share one
  exchange + sort; aggregations on the same key reuse it too);
- no driver-side state, no collect, no iteration;
- event-time columns stay TimestampType so the same plans run under
  Structured Streaming with a watermark swapped in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion over an events table.

    A user completes step k when an event of type ``steps[k]`` occurs
    STRICTLY AFTER their completion of step k-1 (first-touch
    semantics: the earliest qualifying event per step counts).
    Returns one row per funnel step: (step, step_name, n_users,
    conversion_rate) where conversion_rate is vs step 1's population.

    Plan shape: all per-user step times are nested window minima over
    ONE partitioning (user) — Catalyst plans consecutive Window
    operators over the same partitionBy with a single exchange + sort,
    so the whole funnel costs one shuffle of the filtered events plus
    one tiny final aggregation. No joins, no per-step passes: adding a
    step adds a column, not a scan. (The alternative agg-join-agg
    chain re-shuffles per step; at 100 TB that is k shuffles of the
    fact table instead of one.)
    """
    w = Window.partitionBy(user_col)
    ev = events.filter(F.col(type_col).isin(steps)).select(
        user_col, type_col, ts_col
    )
    # t_k = min ts of step-k events after t_{k-1}; chained selects keep
    # each t_k a plain column the next window expression can reference.
    prev = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        ev = ev.withColumn(
            f"t{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = f"t{i}"
    per_user = ev.groupBy(user_col).agg(
        *[F.max(f"t{i}").alias(f"t{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[
            F.count(f"t{i}").cast("long").alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    # One-row result pivots to step rows driver-free. Step names enter
    # as TYPED LITERALS (struct array + inline), never interpolated
    # into SQL text — a name containing quotes or SQL metacharacters is
    # plain data, not expression syntax.
    entries = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("step_name"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, step in enumerate(steps)
        ]
    )
    return (
        counts.select(F.inline(entries), F.col("n0").alias("_n0"))
        .select(
            F.col("step").cast("int").alias("step"),
            "step_name",
            "n_users",
            F.round(
                F.when(F.col("_n0") > 0, F.col("n_users") / F.col("_n0")).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("conversion_rate"),
        )
        .orderBy("step")
    )


def retention_cohorts(
    events: DataFrame,
    max_weeks: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix.

    Cohort = the Monday-truncated week of a user's FIRST event; a user
    counts as retained in offset k if they have any event in cohort
    week + k weeks. Returns (cohort_week DATE, week_offset INT,
    n_active LONG, retention_rate) with retention vs the cohort's
    offset-0 size.

    Plan: first-event week via one window min over user (1 shuffle),
    distinct (cohort, offset, user) map-side, then a single agg on
    (cohort, offset) and a broadcast-sized join back for the cohort
    denominators. The user-keyed shuffle dominates and happens once.
    """
    w = Window.partitionBy(user_col)
    week = F.date_trunc("week", F.col(ts_col))
    active = (
        events.select(
            F.col(user_col).alias("u"),
            week.alias("wk"),
            F.min(week).over(w).alias("cohort_wk"),
        )
        .withColumn(
            "week_offset",
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7).cast("int"),
        )
        .filter(F.col("week_offset") <= max_weeks)
        .select("cohort_wk", "week_offset", "u")
        .distinct()
    )
    counts = active.groupBy("cohort_wk", "week_offset").agg(
        F.count("*").cast("long").alias("n_active")
    )
    base = counts.filter(F.col("week_offset") == 0).select(
        "cohort_wk", F.col("n_active").alias("n_cohort")
    )
    return (
        counts.join(F.broadcast(base), "cohort_wk")
        .select(
            F.to_date("cohort_wk").alias("cohort_week"),
            "week_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("n_cohort"), 6).alias(
                "retention_rate"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier profile via median absolute deviation.

    A value is an outlier when |v - median| > k * MAD (raw MAD, no
    1.4826 normal-consistency scaling — callers wanting sigma units
    fold the constant into ``k``). Median/MAD resist the heavy-tailed
    contamination that wrecks mean/stddev z-scores, which is why
    they're the standard guardrail stat for training-data numeric
    columns. Returns one row per group: (group, n, med, mad,
    n_outliers, outlier_rate).

    Plan shape: two grouped exact-percentile aggregations over the SAME
    group key (the second over |v - med| after a broadcast join of the
    O(groups) median table), then one final count agg — three passes
    over the fact table but only ONE fact-table shuffle key, and the
    med/mad tables that join back are broadcast-sized. At 100 TB with
    huge groups, swap F.percentile for approx_percentile (t-digest,
    mergeable partials) — same query shape, bounded memory.
    """
    g = F.col(group_col)
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("med")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(group_col).agg(F.percentile("_absdev", F.lit(0.5)).alias("mad"))
    flagged = dev.join(F.broadcast(mad), group_col)
    return (
        flagged.groupBy(group_col)
        .agg(
            F.count(value_col).cast("long").alias("n"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("_absdev") > F.lit(k) * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .withColumn(
            "outlier_rate", F.round(F.col("n_outliers") / F.col("n"), 6)
        )
        .orderBy(g)
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for each ordered adjacent pair within a user's timeline,
    count (prev_type -> next_type) and the row-normalized transition
    probability. ``seq_col`` breaks same-timestamp ties so the chain
    is total-ordered and results are engine-independent.

    Plan: ONE user-keyed window sort produces the lag column, then a
    single tiny agg on (prev, next) — O(types²) rows — with the
    per-prev denominator as a window sum over that already-tiny
    result (no second fact shuffle). The user shuffle dominates and
    happens once; state per user is one row, so the same shape runs
    under transformWithState for streaming.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, seq_col)
    pairs = (
        events.select(user_col, type_col, ts_col, seq_col)
        .withColumn("prev_type", F.lag(type_col).over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy(
        "prev_type", F.col(type_col).alias("next_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    ).orderBy("prev_type", "next_type")


def rolling_distinct_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Trailing N-day distinct-user count per day (rolling DAU→WAU).

    Spark (like every SQL engine) cannot evaluate COUNT(DISTINCT) over
    a sliding RANGE frame — distinct state is not mergeable across
    frame slides. The scalable rewrite: collapse to distinct
    (user, day) pairs, EXPLODE each pair onto the ``window_days`` days
    it contributes to (a bounded constant fan-out, JVM-side sequence),
    then one exact count-distinct groupBy per day. Cost is
    window_days × distinct daily actives — independent of raw event
    volume after the first dedup, and each stage is a plain shuffle
    that AQE can size. (The approximate alternative at extreme scale
    is mergeable HLL sketches per day, unioned over the window — same
    query shape, sketch_stats shows the portable-KMV variant.)

    Output is restricted to OBSERVED days (days with at least one
    event), so the report ends at the data's last day instead of
    coasting ``window_days - 1`` days past it on stale contributions;
    the restriction is a broadcast semi-join against the O(days)
    distinct-day set.
    """
    day = F.to_date(ts_col)
    pairs = events.select(
        F.col(user_col).alias("u"), day.alias("d")
    ).distinct()
    contrib = pairs.select(
        "u",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))
        ).alias("day"),
    )
    observed = pairs.select(F.col("d").alias("day")).distinct()
    return (
        contrib.join(F.broadcast(observed), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("u").cast("long").alias("n_users"))
        .orderBy("day")
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    time_col: str,
    seq_col: str,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    feed: collapse consecutive rows with the same attribute value into
    validity intervals (valid_from, valid_to, is_current).

    ``seq_col`` breaks timestamp ties deterministically (two changes at
    the same instant resolve by sequence order — without it the lag
    comparison is nondeterministic under shuffle).

    NULL attribute values are first-class: change detection is
    null-safe (``eqNullSafe`` — SQL's IS DISTINCT FROM), so a
    transition from a value to NULL opens a new interval and a run of
    NULLs collapses into one. The first row per key is detected by
    rank, not by ``lag IS NULL``, which would misread a genuinely-NULL
    previous attribute as a boundary.

    Plan: two window passes over ONE (key, time, seq) sort — change
    detection via lag, then interval close via lead on the filtered
    change rows. Spark executes both over a single exchange; the
    filter between them is narrow. This is the standard
    warehouse-merge building block (the reference's ON CONFLICT merge,
    SURVEY K4, is the degenerate keep-first case with no history).
    """
    w = Window.partitionBy(key_col).orderBy(time_col, seq_col)
    changes = (
        df.select(key_col, attr_col, time_col, seq_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(
            (F.col("_rn") == 1) | ~F.col(attr_col).eqNullSafe(F.col("_prev"))
        )
    )
    w2 = Window.partitionBy(key_col).orderBy(time_col, seq_col)
    return (
        changes.withColumn("valid_to", F.lead(time_col).over(w2))
        .select(
            F.col(key_col),
            F.col(attr_col),
            F.col(time_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
