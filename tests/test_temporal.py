"""As-of join and range join edge semantics on handcrafted frames."""

from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators.temporal import asof_join, range_pair_join


def test_asof_backward_inclusive_and_unmatched(spark):
    left = spark.createDataFrame(
        [("p1", "u1", 100), ("p2", "u1", 50), ("p3", "u2", 10)],
        "event_id string, user_id string, sec long",
    )
    right = spark.createDataFrame(
        [("u1", 50, 1.0), ("u1", 80, 2.0), ("u1", 101, 9.0), ("u2", 999, 5.0)],
        "user_id string, sec long, value double",
    )
    out = {
        r["event_id"]: (r["asof_sec"], r["asof_value"])
        for r in asof_join(left, right, on="sec", by="user_id").collect()
    }
    assert out["p1"] == (80, 2.0)  # latest at-or-before 100; 101 excluded
    assert out["p2"] == (50, 1.0)  # tie at same time matches (inclusive)
    assert out["p3"] == (None, None)  # nothing at-or-before -> nulls


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [("p1", "u1", 100)], "event_id string, user_id string, sec long"
    )
    right = spark.createDataFrame(
        [("u1", 10, 1.0)], "user_id string, sec long, value double"
    )
    with_tol = asof_join(left, right, on="sec", by="user_id", tolerance=30).collect()[0]
    assert with_tol["asof_value"] is None  # 90s stale > 30s tolerance
    no_tol = asof_join(left, right, on="sec", by="user_id").collect()[0]
    assert no_tol["asof_value"] == 1.0


def test_range_pairs_bounds_and_no_duplicates(spark):
    e = spark.createDataFrame(
        [
            ("e1", "u1", 0),
            ("e2", "u1", 299),   # within 300 of e1
            ("e3", "u1", 300),   # exactly 300 of e1 (inclusive), 1 of e2
            ("e4", "u1", 1000),  # out of range of all
            ("e5", "u2", 1),     # other user
        ],
        "event_id string, user_id string, sec long",
    )
    rows = range_pair_join(e, gap=300, ts_col="sec", key_col="user_id", id_col="event_id")
    got = sorted((r["id_1"], r["id_2"], r["dt"]) for r in rows.collect())
    assert got == [("e1", "e2", 299), ("e1", "e3", 300), ("e2", "e3", 1)]


def test_asof_plan_has_no_nested_loop(spark):
    left = spark.createDataFrame(
        [("p1", "u1", 100)], "event_id string, user_id string, sec long"
    )
    right = spark.createDataFrame(
        [("u1", 10, 1.0)], "user_id string, sec long, value double"
    )
    plan = asof_join(left, right, on="sec", by="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan