"""Unit tests for funnel / retention / SCD2 / fixed-size sampling /
n-gram LM operators (edge semantics the sf-data oracle can't isolate)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators import analytics as A
from nypd_arrest_etl_spark.operators import sampling as S
from nypd_arrest_etl_spark.operators import text as TX


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def events(spark):
    rows = [
        # u1 completes the whole funnel in order
        (1, ts("2024-01-01T10:00:00"), "view"),
        (1, ts("2024-01-01T10:05:00"), "click"),
        (1, ts("2024-01-01T10:10:00"), "purchase"),
        # u2: purchase BEFORE any view -> only step 1 counts
        (2, ts("2024-01-01T09:00:00"), "purchase"),
        (2, ts("2024-01-01T11:00:00"), "view"),
        # u3: view then click, no purchase
        (3, ts("2024-01-02T08:00:00"), "view"),
        (3, ts("2024-01-02T08:01:00"), "click"),
        # u4: click only -> no funnel entry
        (4, ts("2024-01-02T07:00:00"), "click"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_strict_ordering(events):
    out = {
        r["step_name"]: r
        for r in A.funnel(events, ["view", "click", "purchase"]).collect()
    }
    assert out["view"]["n_users"] == 3  # u1, u2, u3
    assert out["click"]["n_users"] == 2  # u1, u3 (u4 never viewed)
    assert out["purchase"]["n_users"] == 1  # u1 only (u2's purchase predates view)
    assert out["purchase"]["conversion_rate"] == pytest.approx(1 / 3, abs=1e-6)


def test_funnel_single_shuffle_plan(events):
    plan = A.funnel(events, ["view", "click", "purchase"])._jdf.queryExecution(
    ).executedPlan().toString()
    # chained window minima over one partitioning -> exactly one
    # user-keyed exchange (plus the 1-row final agg's exchange)
    assert plan.count("hashpartitioning(user_id") <= 1


def test_retention_cohorts(spark):
    rows = [
        (1, ts("2024-01-01T00:00:00")),  # cohort week Mon 2024-01-01
        (1, ts("2024-01-09T00:00:00")),  # +1 week
        (2, ts("2024-01-03T00:00:00")),  # same cohort
        (2, ts("2024-01-25T00:00:00")),  # +3 weeks
        (3, ts("2024-01-10T00:00:00")),  # cohort week Mon 2024-01-08
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(str(r["cohort_week"]), r["week_offset"]): r for r in
           A.retention_cohorts(ev, max_weeks=8).collect()}
    assert out[("2024-01-01", 0)]["n_active"] == 2
    assert out[("2024-01-01", 1)]["n_active"] == 1
    assert out[("2024-01-01", 3)]["n_active"] == 1
    assert out[("2024-01-01", 1)]["retention_rate"] == pytest.approx(0.5)
    assert out[("2024-01-08", 0)]["n_active"] == 1


def test_scd2_collapses_runs_and_marks_current(spark):
    rows = [
        (1, "O", ts("2024-01-01T00:00:00"), 1),
        (1, "O", ts("2024-01-02T00:00:00"), 2),  # same status -> collapsed
        (1, "F", ts("2024-01-05T00:00:00"), 3),
        (1, "O", ts("2024-01-09T00:00:00"), 4),  # back to O -> NEW interval
        (2, "F", ts("2024-01-01T00:00:00"), 5),
    ]
    df = spark.createDataFrame(rows, "k long, st string, t timestamp, seq long")
    out = A.scd2_history(df, "k", "st", "t", "seq").orderBy("k", "valid_from").collect()
    k1 = [r for r in out if r["k"] == 1]
    assert [r["st"] for r in k1] == ["O", "F", "O"]
    assert k1[0]["valid_to"] == k1[1]["valid_from"]
    assert k1[1]["valid_to"] == k1[2]["valid_from"]
    assert [r["is_current"] for r in k1] == [False, False, True]
    k2 = [r for r in out if r["k"] == 2]
    assert len(k2) == 1 and k2[0]["is_current"]


def test_scd2_null_attribute_transitions(spark):
    """NULL attribute values are real states: value->NULL opens a new
    interval, a NULL run collapses to one row, NULL->value is a change."""
    rows = [
        (1, "A", ts("2024-01-01T00:00:00"), 1),
        (1, None, ts("2024-01-02T00:00:00"), 2),  # A -> NULL: a change
        (1, None, ts("2024-01-03T00:00:00"), 3),  # NULL run: collapsed
        (1, "B", ts("2024-01-04T00:00:00"), 4),  # NULL -> B: a change
        (2, None, ts("2024-01-01T00:00:00"), 5),  # first row IS the history
    ]
    df = spark.createDataFrame(rows, "k long, st string, t timestamp, seq long")
    out = A.scd2_history(df, "k", "st", "t", "seq").orderBy("k", "valid_from").collect()
    k1 = [r for r in out if r["k"] == 1]
    assert [r["st"] for r in k1] == ["A", None, "B"]
    assert k1[0]["valid_to"] == k1[1]["valid_from"]
    assert k1[1]["valid_to"] == k1[2]["valid_from"]
    assert [r["is_current"] for r in k1] == [False, False, True]
    k2 = [r for r in out if r["k"] == 2]
    assert len(k2) == 1 and k2[0]["st"] is None and k2[0]["is_current"]


def test_funnel_step_names_are_data_not_sql(spark):
    """Step names with quotes/SQL metachars flow through as typed
    literals — no expression-text interpolation to break or inject."""
    rows = [
        (1, ts("2024-01-01T10:00:00"), "sign'up -- x"),
        (1, ts("2024-01-01T10:05:00"), 'pay"; drop'),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["step_name"]: r["n_users"] for r in A.funnel(
        ev, ["sign'up -- x", 'pay"; drop']).collect()}
    assert out == {"sign'up -- x": 1, 'pay"; drop': 1}


def test_scd2_tie_break_deterministic(spark):
    # two changes at the SAME timestamp resolve by seq
    rows = [
        (1, "A", ts("2024-01-01T00:00:00"), 10),
        (1, "B", ts("2024-01-01T00:00:00"), 20),
    ]
    df = spark.createDataFrame(rows, "k long, st string, t timestamp, seq long")
    out = A.scd2_history(df, "k", "st", "t", "seq").orderBy("valid_from", "st").collect()
    cur = [r["st"] for r in out if r["is_current"]]
    assert cur == ["B"]


def test_oversample_fractional_threshold_exact(spark):
    """The fractional-copy cut is the Python-side int(round(frac*1e6))
    — weight 0.7 keeps exactly the keys hashing under 700000 (the
    float expression (0.7 - floor(0.7)) * 1e6 = 699999.999... would
    drop the boundary bucket)."""
    df = spark.range(1000).select(F.col("id").alias("k"), F.lit("s").alias("src"))
    out = S.oversample_mixture(df, "k", "src", {"s": 0.7}, salt=3, portable=True)
    expected = df.filter(S.keep_hash(F.col("k"), 3, portable=True) < 700000).count()
    assert out.count() == expected


def test_fixed_size_per_group_exact_and_deterministic(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("src")
    )
    a = S.fixed_size_per_group(df, "doc_id", "src", m=10, salt=1)
    b = S.fixed_size_per_group(df.repartition(7), "doc_id", "src", m=10, salt=1)
    ra = sorted(r["doc_id"] for r in a.collect())
    rb = sorted(r["doc_id"] for r in b.collect())
    assert len(ra) == 30 and ra == rb  # exact size, partitioning-independent
    c = S.fixed_size_per_group(df, "doc_id", "src", m=10, salt=2)
    assert sorted(r["doc_id"] for r in c.collect()) != ra  # salt redraws
    # small group: returns the whole group, no padding
    tiny = S.fixed_size_per_group(df.filter("doc_id < 2"), "doc_id", "src", m=10)
    assert tiny.count() == 2


def test_fixed_size_plan_uses_window_group_limit(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("src")
    )
    plan = S.fixed_size_per_group(df, "doc_id", "src", m=10)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_ngram_lm_score_matches_hand_computation(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b x"), (3, "z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in TX.ngram_lm_score(docs).collect()}
    # corpus bigrams: d1: (a b),(b a),(a b); d2: (a b),(b x)
    # c2: ab=3, ba=1, bx=1 ; marginals over bigram starts: a·=3, b·=2
    lp = {"ab": math.log2(3 / 3), "ba": math.log2(1 / 2), "bx": math.log2(1 / 2)}
    exp1 = (lp["ab"] + lp["ba"] + lp["ab"]) / 3
    exp2 = (lp["ab"] + lp["bx"]) / 2
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_log2p"] == pytest.approx(exp1, abs=1e-6)
    assert out[2]["avg_log2p"] == pytest.approx(exp2, abs=1e-6)
    assert 3 not in out  # single-token doc has no transitions


def test_histogram_bins_and_spine(spark):
    from nypd_arrest_etl_spark.operators.sampling import histogram

    df = spark.createDataFrame([(float(v),) for v in [0, 1, 2, 3, 10]], "x double")
    out = histogram(df, "x", bins=5).collect()
    assert [r["bin"] for r in out] == [0, 1, 2, 3, 4]
    # width 2: [0,2)=2 rows, [2,4)=2, [4,6)=0, [6,8)=0, [8,10]=1 (max inclusive)
    assert [r["n_rows"] for r in out] == [2, 2, 0, 0, 1]
    assert out[0]["lo"] == 0.0 and out[-1]["hi"] == 10.0
    # degenerate: constant column -> all rows in bin 0, no div-by-zero
    const = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    c = histogram(const, "x", bins=3).collect()
    assert [r["n_rows"] for r in c] == [2, 0, 0]


def test_resample_interpolate_linear_and_flat_ends(spark):
    from nypd_arrest_etl_spark.operators.temporal import resample_interpolate

    rows = [
        (1, 0, 10.0),
        (1, 300, 40.0),   # gap at 100/200 -> linear 20, 30
        (2, 0, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, sec long, value double")
    out = {
        (r["user_id"], r["bucket_sec"]): r
        for r in resample_interpolate(df, every_seconds=100).collect()
    }
    assert out[(1, 0)]["value"] == 10.0 and out[(1, 0)]["is_observed"]
    assert out[(1, 100)]["value"] == 20.0 and not out[(1, 100)]["is_observed"]
    assert out[(1, 200)]["value"] == 30.0
    assert out[(1, 300)]["value"] == 40.0
    assert out[(2, 0)]["value"] == 5.0
    assert len([k for k in out if k[0] == 1]) == 4  # full grid, no extras


def test_resample_bucket_mean_and_fixed_point(spark):
    from nypd_arrest_etl_spark.operators.temporal import resample_interpolate

    rows = [(1, 10, 1.25), (1, 20, 1.75), (1, 130, 3.0)]
    df = spark.createDataFrame(rows, "user_id long, sec long, value double")
    out = {
        r["bucket_sec"]: r["value"]
        for r in resample_interpolate(
            df, every_seconds=100, value_scale=2
        ).collect()
    }
    assert out[0] == 1.5  # mean of the two observations in bucket 0
    assert out[100] == 3.0


def test_mad_outliers_flags_extreme_values(spark):
    # group 'a': values 1..9 plus one wild 1000 -> med 5.5, MAD robust
    rows = [("a", float(v)) for v in range(1, 10)] + [("a", 1000.0)]
    # group 'b': constant values -> MAD 0, nothing can exceed 0 threshold
    rows += [("b", 7.0)] * 5
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {r["grp"]: r for r in A.mad_outliers(df, "grp", "value", k=3.5).collect()}
    a = out["a"]
    assert a["n"] == 10 and a["n_outliers"] == 1  # only the 1000
    assert a["med"] == 5.5
    b = out["b"]
    assert b["mad"] == 0.0 and b["n_outliers"] == 0
    assert b["outlier_rate"] == 0.0


def test_mad_outliers_null_values_ignored(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None)],
        "grp string, value double",
    )
    row = A.mad_outliers(df, "grp", "value").collect()[0]
    assert row["n"] == 3 and row["med"] == 2.0 and row["n_outliers"] == 0


def test_event_transitions_counts_and_probabilities(spark):
    rows = [
        # u1: view -> click -> view  (transitions: view->click, click->view)
        (1, ts("2024-01-01T10:00:00"), 1, "view"),
        (1, ts("2024-01-01T10:01:00"), 2, "click"),
        (1, ts("2024-01-01T10:02:00"), 3, "view"),
        # u2: view -> view (self-transition)
        (2, ts("2024-01-01T09:00:00"), 4, "view"),
        (2, ts("2024-01-01T09:30:00"), 5, "view"),
        # u3: single event -> no transition
        (3, ts("2024-01-01T08:00:00"), 6, "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        (r["prev_type"], r["next_type"]): r
        for r in A.event_transitions(df).collect()
    }
    assert out[("view", "click")]["n"] == 1
    assert out[("view", "view")]["n"] == 1
    assert out[("click", "view")]["n"] == 1
    # row-normalization: from 'view' there are 2 outgoing transitions
    assert out[("view", "click")]["p"] == 0.5
    assert out[("click", "view")]["p"] == 1.0
    assert len(out) == 3


def test_event_transitions_tie_break_on_seq(spark):
    # two events at the SAME timestamp: order resolves by event_id
    rows = [
        (1, ts("2024-01-01T10:00:00"), 10, "a"),
        (1, ts("2024-01-01T10:00:00"), 11, "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = A.event_transitions(df).collect()
    assert len(out) == 1
    assert (out[0]["prev_type"], out[0]["next_type"]) == ("a", "b")


def test_rolling_distinct_users_window_and_observed_days(spark):
    rows = [
        # u1 active day 1; u2 active day 1 and day 9; u3 active day 3
        (1, ts("2024-01-01T10:00:00")),
        (2, ts("2024-01-01T11:00:00")),
        (3, ts("2024-01-03T10:00:00")),
        (2, ts("2024-01-09T10:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {str(r["day"]): r["n_users"] for r in A.rolling_distinct_users(df, 7).collect()}
    # only OBSERVED days appear (1st, 3rd, 9th) — no coasting past data
    assert set(out) == {"2024-01-01", "2024-01-03", "2024-01-09"}
    assert out["2024-01-01"] == 2            # u1, u2
    assert out["2024-01-03"] == 3            # u1, u2 (1st) + u3 (3rd)
    # day 9: trailing window [3rd..9th] -> u3 (3rd) + u2 (9th); u1/u2 of
    # the 1st fell out of the 7-day window
    assert out["2024-01-09"] == 2


def test_rolling_distinct_users_dedups_within_window(spark):
    # same user active on two days of one window counts once
    rows = [(1, ts("2024-01-01T10:00:00")), (1, ts("2024-01-02T10:00:00"))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {str(r["day"]): r["n_users"] for r in A.rolling_distinct_users(df, 7).collect()}
    assert out == {"2024-01-01": 1, "2024-01-02": 1}
