"""Temporal join operators: as-of join and bounded range join.

Spark has no native ASOF JOIN (SURVEY.md §2e marks the category absent
in the reference too); a naive formulation is a non-equi theta join
that Catalyst plans as a broadcast-nested-loop — quadratic and
unusable at scale. Both operators here reduce to ONE equi-shuffle:

- ``asof_join``: union-then-window. Tag right rows, union with left,
  sort within each key partition by time; the "most recent right value
  at or before t" is ``last(value, ignorenulls=True)`` over the
  running frame. One shuffle on the key, no join at all — the standard
  scale formulation (classic kdb/pandas merge_asof semantics,
  backward direction, inclusive).
- ``range_pair_join``: time-bucketing. Events within ``gap`` seconds
  must fall in the same or adjacent ``gap``-sized bucket, so exploding
  the left side into two bucket keys turns the interval predicate into
  an equi-join with an exact residual filter. Join fan-in is bounded
  by events-per-2*gap per key, never corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, append the latest right
    row's ``value_cols`` with ``right.on <= left.on`` and same ``by``
    key (inclusive, ties prefer the right row). Unmatched -> nulls;
    with ``tolerance`` (same units as ``on``), matches older than
    ``on - tolerance`` are nulled out.

    All left columns are preserved; value columns get an ``asof_``
    prefix. One shuffle on ``by``; at 100 TB skewed keys fall to AQE
    skew splitting (safe: the window is per-key-ordered, and salting
    would break cross-row carry semantics — prefer key+time-range
    pre-bucketing for pathological keys).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    lcols = left.columns
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__rt"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
    )
    r_tag = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) if c != by and c != on else F.col(c) for c in lcols],
        F.lit(0).alias("__is_left"),
        F.col(on).cast("long").alias("__rt"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal time -> inclusive match
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__is_left",
        F.last("__rt", ignorenulls=True).over(w).alias("__matched_t"),
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__is_left") == 1)
    if tolerance is not None:
        in_tol = F.col("__matched_t") >= F.col(on).cast("long") - F.lit(tolerance)
        carried = carried.select(
            *lcols,
            F.when(in_tol, F.col("__matched_t")).alias("__matched_t"),
            *[
                F.when(in_tol, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
        )
    return carried.select(
        *lcols,
        F.col("__matched_t").alias(f"asof_{on}"),
        *[F.col(f"asof_{c}") for c in value_cols],
    )


def range_pair_join(
    events: DataFrame,
    gap: int,
    ts_col: str = "sec",
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Pairs of same-key events within ``gap`` time units
    (0 < t2 - t1 <= gap, id1 != id2; ordered so t1 <= t2).

    Bucketing: right side keyed by its own bucket; left side exploded
    to (bucket, bucket+1) so any pair within ``gap`` shares a join
    key; the exact range predicate filters residuals. Equi-shuffle on
    (key, bucket) — no nested-loop, fan-in bounded by 2*gap density.
    """
    e = events.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("k"),
        F.col(ts_col).cast("long").alias("t"),
        (F.col(ts_col).cast("long") / gap).cast("long").alias("b"),
    )
    lhs = e.select(
        "id", "k", "t", F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("jb")
    )
    rhs = e.select(
        F.col("id").alias("id2"),
        F.col("k").alias("k2"),
        F.col("t").alias("t2"),
        F.col("b").alias("jb"),
    )
    dt = F.col("t2") - F.col("t")
    return (
        lhs.join(rhs, ["jb"])
        .filter(
            (F.col("k") == F.col("k2"))
            & (dt > 0)
            & (dt <= gap)
        )
        .select(
            F.col("k").alias(key_col),
            F.col("id").alias("id_1"),
            F.col("id2").alias("id_2"),
            dt.alias("dt"),
        )
    )  # no dedup needed: each qualifying pair matches exactly one bucket key


def resample_interpolate(
    df: DataFrame,
    every_seconds: int,
    key_col: str = "user_id",
    sec_col: str = "sec",
    val_col: str = "value",
    value_scale: int | None = None,
) -> DataFrame:
    """Per-key regular-grid resampling with linear interpolation —
    (key, bucket_sec, value, is_observed) at every ``every_seconds``
    step between the key's first and last observation.

    Observed buckets carry the mean of their values; empty buckets
    interpolate linearly between the nearest observed buckets
    (endpoints extend flat). The time-series shape every metrics store
    serves, built from three window passes over ONE (key, bucket)
    sort:

    scan -> bucket-mean groupBy (1 shuffle) -> per-key grid via
    sequence()/explode (narrow: the grid generates inside the key's
    partition, no grid table is shuffled) -> forward fill
    (last ignorenulls) + backward fill (first ignorenulls over the
    reversed frame) of both value and its bucket -> interpolate.
    Consecutive Window specs share one exchange+sort; the plan
    shuffles the BUCKET table (|keys| x |buckets|), never raw events,
    and grid density is capped by each key's own observation span.
    """
    bucket = (F.floor(F.col(sec_col) / every_seconds) * every_seconds).cast("long")
    # value_scale: when the metric is fixed-point with that many decimals
    # (a price, a 2-decimal gauge), accumulate EXACT integers and divide
    # once — the mean is then bit-identical regardless of summation order,
    # which floating avg() is not (cross-engine/partitioning ulp wobble
    # can straddle any later rounding boundary). None = plain avg.
    src = df.select(
        F.col(key_col).alias("k"), bucket.alias("b"), F.col(val_col).alias("v")
    )
    if value_scale is not None:
        scale = 10 ** value_scale
        means = src.groupBy("k", "b").agg(
            (
                F.sum(F.round(F.col("v") * scale).cast("long"))
                / (F.lit(float(scale)) * F.count("v"))
            ).alias("v")
        )
    else:
        means = src.groupBy("k", "b").agg(F.avg("v").alias("v"))
    # The bucket-mean table feeds two branches with different pruning
    # (span wants k/b, the grid join wants k/b/v), so exchange reuse
    # cannot kick in — without this cache the whole events scan + mean
    # aggregation executes twice. The cache is (key x active-bucket)
    # sized: the resample's own working set, MEMORY_AND_DISK at scale.
    means = means.cache()
    span = means.groupBy("k").agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    grid = span.select(
        "k",
        F.explode(
            F.sequence(F.col("b0"), F.col("b1"), F.lit(int(every_seconds)))
        ).alias("b"),
    )
    g = grid.join(means, ["k", "b"], "left")
    # Both fills are RUNNING frames: the backward fill uses last() over
    # DESCENDING order rather than first() over an UnboundedFollowing
    # frame — Spark executes UnboundedFollowing by recomputing the
    # aggregate from each row to the partition end (O(n^2) per key:
    # measured 10.3s -> 1.7s at sf0.1 for 720-bucket partitions). The
    # price is one extra sort of the grid, amortized by the shared
    # partitioning.
    wf = Window.partitionBy("k").orderBy(F.col("b").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wr = Window.partitionBy("k").orderBy(F.col("b").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    obs_b = F.when(F.col("v").isNotNull(), F.col("b"))
    filled = g.select(
        "k",
        "b",
        "v",
        F.last("v", ignorenulls=True).over(wf).alias("pv"),
        F.last(obs_b, ignorenulls=True).over(wf).alias("pb"),
        F.last("v", ignorenulls=True).over(wr).alias("nv"),
        F.last(obs_b, ignorenulls=True).over(wr).alias("nb"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("b") - F.col("pb"))
            / (F.col("nb") - F.col("pb"))
        )
    )
    # floor(x*1e6 + 0.5)/1e6 instead of round(x, 6): interpolation on a
    # regular grid produces EXACT decimal halves (midpoints of fixed-point
    # means), where engines disagree on half-rounding direction; floor of
    # the same double is deterministic everywhere.
    return filled.select(
        F.col("k").alias(key_col),
        F.col("b").alias("bucket_sec"),
        (F.floor(interp * 1_000_000 + F.lit(0.5)) / 1_000_000).alias("value"),
        F.col("v").isNotNull().alias("is_observed"),
    )
