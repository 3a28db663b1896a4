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


# ---------------------------------------------------------------------------
# Logistic probe (IRLS)
# ---------------------------------------------------------------------------


def _numpy_irls_twin(x, y, iterations=2):
    """Pure-numpy twin of fit_logistic_probe's quantized k=1 IRLS —
    same 1e-6 fixed-point quantization, same 2x2 closed form, same
    per-iteration rounding — for exact-equality testing."""
    import numpy as np

    b0 = b1 = 0.0
    for _ in range(iterations):
        eta = b0 + b1 * x
        p_raw = 1.0 / (1.0 + np.exp(-eta))
        P = np.clip(np.floor(p_raw * 1_000_000 + 0.5), 1, 999_999)
        ws = P * (1_000_000 - P)
        s0, s1, s2 = ws.sum(), (ws * x).sum(), (ws * x * x).sum()
        resid = y * 1_000_000 - P
        c0, c1 = resid.sum(), (x * resid).sum()
        t0 = (s0 * b0 + s1 * b1) * 1e-12 + c0 * 1e-6
        t1 = (s1 * b0 + s2 * b1) * 1e-12 + c1 * 1e-6
        det = s0 * s2 - s1 * s1
        b0 = round(((s2 * t0 - s1 * t1) / det) * 1e12, 10)
        b1 = round(((s0 * t1 - s1 * t0) / det) * 1e12, 10)
    return [b0, b1]


def test_logistic_probe_matches_numpy_twin_exactly(spark):
    import numpy as np

    from nypd_arrest_etl_spark.operators.probe import fit_logistic_probe

    rng = [(i, float(5 + (i * 37) % 60), 1.0 if (i * 37) % 60 > 30 else 0.0)
           for i in range(200)]
    df = spark.createDataFrame(rng, "id long, x double, y double")
    got = fit_logistic_probe(df, ["x"], "y", iterations=2)
    x = np.array([r[1] for r in rng])
    y = np.array([r[2] for r in rng])
    want = _numpy_irls_twin(x, y)
    # exact: the quantized sums are integers, the solve is the same
    # formula text, the rounding grid is identical
    assert got == want


def test_logistic_probe_separates_and_scores_monotonically(spark):
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.operators.probe import (
        fit_logistic_probe,
        score_logistic,
    )

    rows = [(i, float(i), 1.0 if i >= 10 else 0.0) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    b = fit_logistic_probe(df, ["x"], "y", iterations=4)
    assert b[1] > 0  # larger x -> higher probability
    scored = df.select("id", score_logistic(["x"], b).alias("p")).collect()
    ps = {r.id: r.p for r in scored}
    assert all(0.0 < p < 1.0 for p in ps.values())
    assert ps[19] > ps[10] > ps[0]
    assert ps[19] > 0.5 > ps[0]


def test_logistic_probe_multifeature_numpy_path(spark):
    from nypd_arrest_etl_spark.operators.probe import fit_logistic_probe

    rows = [(i, float(i % 7), float((i * 3) % 5),
             1.0 if (i % 7) + ((i * 3) % 5) > 5 else 0.0) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y double")
    b = fit_logistic_probe(df, ["x1", "x2"], "y", iterations=3)
    assert len(b) == 3
    assert b[1] > 0 and b[2] > 0


def test_logistic_probe_degenerate_labels_still_solve(spark):
    from nypd_arrest_etl_spark.operators.probe import fit_logistic_probe

    rows = [(i, float(i), 1.0) for i in range(1, 20)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    # all-positive labels: P clamps keep the weights nonzero, the
    # intercept runs positive, no crash
    b = fit_logistic_probe(df, ["x"], "y", iterations=2)
    assert b[0] > 0


def test_logistic_probe_guards(spark):
    import pytest as _pytest

    from nypd_arrest_etl_spark.operators.probe import fit_logistic_probe

    df = spark.createDataFrame([(1, 1.0, None)], "id long, x double, y double")
    with _pytest.raises(ValueError, match="no rows"):
        fit_logistic_probe(df, ["x"], "y")
    with _pytest.raises(ValueError, match="at least one feature"):
        fit_logistic_probe(df, [], "y")
    with _pytest.raises(ValueError, match="iteration"):
        fit_logistic_probe(df, ["x"], "y", iterations=0)


def _numpy_irls_converged_twin(x, y, tol=1e-6, max_iterations=25):
    """Run the quantized twin to the same convergence contract as
    fit_logistic_probe_converged: max|delta beta| < tol on the
    rounded grid."""
    import numpy as np

    b0 = b1 = 0.0
    for it in range(max_iterations):
        eta = b0 + b1 * x
        p_raw = 1.0 / (1.0 + np.exp(-eta))
        P = np.clip(np.floor(p_raw * 1_000_000 + 0.5), 1, 999_999)
        ws = P * (1_000_000 - P)
        s0, s1, s2 = ws.sum(), (ws * x).sum(), (ws * x * x).sum()
        resid = y * 1_000_000 - P
        c0, c1 = resid.sum(), (x * resid).sum()
        t0 = (s0 * b0 + s1 * b1) * 1e-12 + c0 * 1e-6
        t1 = (s1 * b0 + s2 * b1) * 1e-12 + c1 * 1e-6
        det = s0 * s2 - s1 * s1
        nb0 = round(((s2 * t0 - s1 * t1) / det) * 1e12, 10)
        nb1 = round(((s0 * t1 - s1 * t0) / det) * 1e12, 10)
        delta = max(abs(nb0 - b0), abs(nb1 - b1))
        b0, b1 = nb0, nb1
        if delta < tol:
            return [b0, b1], it + 1, True
    return [b0, b1], max_iterations, False


def test_logistic_converged_matches_numpy_twin_exactly(spark):
    import numpy as np

    from nypd_arrest_etl_spark.operators.probe import (
        fit_logistic_probe_converged,
    )

    # classes must OVERLAP: on separable data the logistic MLE does
    # not exist and IRLS diverges forever (the i%7 flips create the
    # label noise a real quality probe always has)
    rng = [(i, float(5 + (i * 37) % 60),
            1.0 if ((i * 37) % 60 > 30) != (i % 7 == 0) else 0.0)
           for i in range(200)]
    df = spark.createDataFrame(rng, "id long, x double, y double")
    x = np.array([r[1] for r in rng])
    y = np.array([r[2] for r in rng])
    want, want_its, want_conv = _numpy_irls_converged_twin(x, y)
    got, its, conv = fit_logistic_probe_converged(df, ["x"], "y")
    assert (got, its, conv) == (want, want_its, want_conv)
    assert conv is True and 1 < its < 25  # really iterated, really stopped


def test_logistic_converged_cap_reports_not_converged(spark):
    from nypd_arrest_etl_spark.operators.probe import (
        fit_logistic_probe,
        fit_logistic_probe_converged,
    )

    rows = [(i, float(5 + (i * 37) % 60),
             1.0 if ((i * 37) % 60 > 30) != (i % 7 == 0) else 0.0)
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    betas, its, conv = fit_logistic_probe_converged(df, ["x"], "y",
                                                    max_iterations=1)
    assert (its, conv) == (1, False)
    # a truncated converged run IS the fixed-step fit, step for step
    assert betas == fit_logistic_probe(df, ["x"], "y", iterations=1)


def test_logistic_converged_tol_below_rounding_grid_raises(spark):
    import pytest

    from nypd_arrest_etl_spark.operators.probe import (
        fit_logistic_probe_converged,
    )

    df = spark.createDataFrame([(1, 1.0, 1.0)], "id long, x double, y double")
    with pytest.raises(ValueError, match="rounding grid"):
        fit_logistic_probe_converged(df, ["x"], "y", tol=1e-12)


def test_logistic_probe_rejects_fractional_features(spark):
    import pytest

    from nypd_arrest_etl_spark.operators.probe import (
        fit_logistic_probe,
        fit_logistic_probe_converged,
    )

    rows = [(i, float(i) + 0.5, 1.0 if i > 5 else 0.0) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    with pytest.raises(ValueError, match="non-integral feature"):
        fit_logistic_probe(df, ["x"], "y")
    with pytest.raises(ValueError, match="non-integral feature"):
        fit_logistic_probe_converged(df, ["x"], "y")


def test_logistic_converged_separable_data_reports_not_converged(spark):
    # y is a deterministic threshold of x -> the MLE does not exist;
    # the fit must hit the cap and SAY it did not converge rather
    # than hand back diverging betas as final
    rows = [(i, float(5 + (i * 37) % 60), 1.0 if (i * 37) % 60 > 30 else 0.0)
            for i in range(200)]
    from nypd_arrest_etl_spark.operators.probe import (
        fit_logistic_probe_converged,
    )

    df = spark.createDataFrame(rows, "id long, x double, y double")
    _betas, its, conv = fit_logistic_probe_converged(
        df, ["x"], "y", max_iterations=5
    )
    assert (its, conv) == (5, False)
