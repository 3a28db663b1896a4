"""Linear probe: exactness vs numpy lstsq, ridge behavior, NULL
hygiene, and the map-only scoring plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators.probe import (
    fit_linear_probe,
    score_linear,
)


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_fit_matches_numpy_lstsq_multifeature(spark):
    rng = [(i, float(i % 7), float((i * 3) % 5), 2.0 + 1.5 * (i % 7) - 0.5 * ((i * 3) % 5) + (0.01 * ((i * 13) % 11)))
           for i in range(200)]
    df = _df(spark, rng, ["id", "x1", "x2", "y"])
    betas = fit_linear_probe(df, ["x1", "x2"], "y")
    X = np.array([[1.0, r[1], r[2]] for r in rng])
    y = np.array([r[3] for r in rng])
    expect, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert betas == pytest.approx(list(expect), abs=1e-9)


def test_fit_exact_on_noiseless_line(spark):
    df = _df(spark, [(float(i), 3.0 + 2.5 * i) for i in range(50)], ["x", "y"])
    b0, b1 = fit_linear_probe(df, ["x"], "y")
    assert (b0, b1) == pytest.approx((3.0, 2.5), abs=1e-9)


def test_ridge_shrinks_and_rescues_collinear(spark):
    # x2 = 2*x1 exactly: unregularized normal equations are singular
    df = _df(spark, [(float(i), 2.0 * i, float(i)) for i in range(20)],
             ["x1", "x2", "y"])
    with pytest.raises(ValueError, match="singular"):
        fit_linear_probe(df, ["x1", "x2"], "y")
    betas = fit_linear_probe(df, ["x1", "x2"], "y", l2=1e-6)
    pred = betas[0] + betas[1] * 10 + betas[2] * 20
    assert pred == pytest.approx(10.0, abs=1e-3)


def test_null_rows_dropped_not_poisoning(spark):
    rows = [(1.0, 2.0), (2.0, 4.0), (None, 99.0), (3.0, None), (3.0, 6.0)]
    df = _df(spark, rows, ["x", "y"])
    b0, b1 = fit_linear_probe(df, ["x"], "y")
    assert (b0, b1) == pytest.approx((0.0, 2.0), abs=1e-9)


def test_empty_input_raises(spark):
    df = spark.createDataFrame([(None, 1.0)], "x double, y double")
    with pytest.raises(ValueError, match="no rows"):
        fit_linear_probe(df, ["x"], "y")


def test_score_linear_is_map_only_literal_plan(spark):
    df = _df(spark, [(1, 2.0, 3.0)], ["id", "a", "b"])
    scored = df.select(score_linear(["a", "b"], [1.0, 2.0, -1.0]).alias("s"))
    assert scored.collect()[0].s == pytest.approx(1.0 + 4.0 - 3.0)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection, no shuffle


def test_score_linear_beta_arity_checked():
    with pytest.raises(ValueError, match="betas"):
        score_linear(["a"], [1.0, 2.0, 3.0])
