"""In-engine linear probes: fit a tiny linear model over
engine-computed document features in ONE aggregation pass, then score
the corpus with a broadcast coefficient vector.

Why this lives in a training-data engine: modern curation recipes
(FineWeb-Edu, Ask-LLM distillates, quality-classifier bootstraps) fit
a cheap linear probe on a labeled slice and score the full corpus with
it. The fit is closed-form distributed least squares — the textbook
one-pass shape:

- ``fit_linear_probe``: assemble the normal equations from ONE
  aggregation (k features -> k(k+3)/2 + 1 scalar sums, all map-side
  partial-aggregated; the shuffle moves one row of partials per
  partition), solve the (k+1)x(k+1) system driver-side with numpy
  (k is single digits — the driver work is microseconds), optional L2
  ridge on the non-intercept terms.
- ``score_linear``: the dot product as a pure column expression —
  coefficients are plan literals, so scoring is map-only whole-stage
  codegen, zero Python, zero shuffle, any corpus size.

At 100 TB: the fit reads each feature row once and reduces to O(k^2)
numbers; nothing about it grows with corpus size except the single
scan. That is the entire point of choosing the closed form over SGD —
no iteration, no driver<->executor ping-pong, deterministic result.

Reference anchor: the reference engine has no model surface; this
extends the LLM-curation layer (SURVEY §2 extensions) alongside
quality_signals / ccnet_buckets, which produce the features a probe
consumes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fit_linear_probe(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    l2: float = 0.0,
) -> list[float]:
    """Least-squares fit of ``label ~ 1 + features`` ->
    [intercept, beta_1, ..., beta_k].

    Rows with a NULL label or NULL feature are dropped (a NULL inside
    the sums would silently poison every coefficient). ``l2`` adds
    ridge regularization on the non-intercept coefficients —
    (X'X + l2*I')beta = X'y with I' zeroing the intercept row — which
    also makes near-collinear feature sets solvable. Raises on an
    empty (post-drop) input or a singular unregularized system.
    """
    try:
        import numpy as np
    except ImportError as exc:  # pragma: no cover - numpy ships in image
        raise RuntimeError("fit_linear_probe needs numpy driver-side") from exc

    k = len(feature_cols)
    if k == 0:
        raise ValueError("fit_linear_probe needs at least one feature")
    cols = [F.lit(1.0)] + [
        F.col(c).cast("double") for c in feature_cols
    ]
    y = F.col(label_col).cast("double")
    clean = df.na.drop(subset=list(feature_cols) + [label_col])
    aggs = []
    # upper triangle of X'X (including the intercept column), then X'y
    for i in range(k + 1):
        for j in range(i, k + 1):
            aggs.append(F.sum(cols[i] * cols[j]).alias(f"xx_{i}_{j}"))
    for i in range(k + 1):
        aggs.append(F.sum(cols[i] * y).alias(f"xy_{i}"))
    row = clean.agg(*aggs).collect()[0]
    if row[f"xx_{0}_{0}"] is None:
        raise ValueError("fit_linear_probe: no rows survive the NULL drop")
    xtx = np.empty((k + 1, k + 1))
    for i in range(k + 1):
        for j in range(i, k + 1):
            xtx[i, j] = xtx[j, i] = row[f"xx_{i}_{j}"]
    xty = np.array([row[f"xy_{i}"] for i in range(k + 1)])
    if l2:
        reg = np.eye(k + 1) * float(l2)
        reg[0, 0] = 0.0  # never shrink the intercept
        xtx = xtx + reg
    try:
        beta = np.linalg.solve(xtx, xty)
    except np.linalg.LinAlgError as exc:
        raise ValueError(
            "fit_linear_probe: singular normal equations — collinear "
            "features; pass l2 > 0"
        ) from exc
    return [float(b) for b in beta]


def score_linear(
    feature_cols: list[str | Column],
    betas: list[float],
) -> Column:
    """``betas[0] + sum(betas[i+1] * feature_i)`` as one codegen'd
    column expression (coefficients become plan literals — broadcast
    by construction, no join, no shuffle)."""
    if len(betas) != len(feature_cols) + 1:
        raise ValueError(
            f"need {len(feature_cols) + 1} betas (intercept first), "
            f"got {len(betas)}"
        )
    expr = F.lit(float(betas[0]))
    for b, c in zip(betas[1:], feature_cols):
        col = F.col(c) if isinstance(c, str) else c
        expr = expr + F.lit(float(b)) * col.cast("double")
    return expr


def fit_logistic_probe(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 2,
    beta_round: int = 10,
) -> list[float]:
    """Logistic probe via IRLS (iteratively reweighted least squares)
    -> [intercept, beta_1, ..., beta_k] after ``iterations`` Newton
    steps from beta = 0. This is the ACTUAL shape of the
    FineWeb-Edu-style quality classifiers (a logistic head over cheap
    features); the linear probe above is its one-pass cousin.

    Each iteration is ONE aggregation pass (same scan-and-reduce
    posture as ``fit_linear_probe`` — k(k+3)/2 + k + 2 scalar sums,
    map-side partial-aggregated) followed by a driver-side
    (k+1)x(k+1) solve; nothing grows with corpus size except the
    per-iteration scan.

    Cross-engine determinism (what makes the fixed-iteration oracle
    hash-replayable): per row the probability is quantized to 1e-6
    fixed point (P = round(p * 1e6), clamped to [1, 999999]) and every
    aggregated term is an exact INTEGER in that fixed-point domain —
    w_s = P(1e6 - P), w_s*x_i*x_j, x_i*(y*1e6 - P) — summed as
    decimal(38,0), which both Spark and DuckDB aggregate exactly, so
    the sums are bit-identical REGARDLESS of summation order (a plain
    double sum diverges between a parallel and a sequential engine by
    ~n*ulp, which feeds back through the iteration). The working
    response never materializes: X'Wz = X'WX . beta + X'(y - p),
    assembled from those sums driver-side.

    Features must be INTEGRAL-VALUED (token counts, byte lengths,
    0/1 flags — the natural engine-computed probe features): the
    fixed-point scheme quantizes the PROBABILITY, and keeps the
    features exact by summing them as integers, which only works if
    they are integers to begin with. A fractional feature would have
    to be truncated or rounded — Spark's cast truncates toward zero
    while DuckDB's rounds to nearest, so the cross-engine
    bit-agreement the oracle relies on would silently break. The fit
    therefore VALIDATES integrality inside the same aggregation pass
    (k extra counting sums, no additional scan) and raises on the
    first fractional feature instead of guessing. Scale features to
    an integer grid first (e.g. ``round(ratio * 1e6)``) if needed. k = 1 solves with the
    explicit 2x2 closed form (the same formula text the SQL oracle
    uses — bit-identical); k > 1 uses numpy (deterministic, but not
    claimed bit-equal to a SQL replay). Betas are rounded to
    ``beta_round`` decimals between iterations so both engines feed
    identical literals forward.
    """
    try:
        import numpy as np
    except ImportError as exc:  # pragma: no cover - numpy ships in image
        raise RuntimeError("fit_logistic_probe needs numpy driver-side") from exc

    k = len(feature_cols)
    if k == 0:
        raise ValueError("fit_logistic_probe needs at least one feature")
    if iterations < 1:
        raise ValueError("fit_logistic_probe needs at least one iteration")
    clean, xs, y6 = _irls_prepared(df, feature_cols, label_col)
    beta = [0.0] * (k + 1)
    try:
        for it in range(iterations):
            beta = _irls_step(
                clean, xs, y6, feature_cols, beta, beta_round,
                check_integral=(it == 0),
            )
    finally:
        clean.unpersist(False)
    return [float(b) for b in beta]


def _irls_prepared(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> tuple[DataFrame, list[Column], Column]:
    """Materialize the (features, quantized label) projection ONCE for
    the IRLS loop (r12 optimization): every Newton step is a full
    scan-and-reduce, and the probe features are usually computed
    expressions (token counts from a regex split, length arithmetic)
    that would otherwise re-evaluate against the raw corpus on every
    iteration — 7-8 re-tokenizations for a typical converged fit. The
    cached frame is (k+1) numeric columns per surviving row (the
    training-set caching posture MLlib's iterative optimizers use);
    callers unpersist it when the loop finishes, which is safe because
    each step's aggregate has already been collected driver-side.
    Values are identical: the same expressions, evaluated once."""
    xs = [F.col(c).cast("double") for c in feature_cols]
    y6 = (F.col(label_col).cast("double") * 1_000_000).cast("long")
    clean = df.na.drop(subset=list(feature_cols) + [label_col]).select(
        *[x.alias(f"_x{i}") for i, x in enumerate(xs)], y6.alias("_y6")
    ).cache()
    return (
        clean,
        [F.col(f"_x{i}") for i in range(len(feature_cols))],
        F.col("_y6"),
    )


def _irls_step(
    clean: DataFrame,
    xs: list[Column],
    y6: Column,
    feature_cols: list[str],
    beta: list[float],
    beta_round: int,
    check_integral: bool,
) -> list[float]:
    """One Newton step of the fixed-point IRLS (shared by the fixed-
    iteration and converged fits): ONE aggregation pass over exact
    integer terms, driver-side (k+1)x(k+1) solve, betas rounded to
    ``beta_round`` decimals. ``check_integral`` adds the feature-
    integrality counting sums to the same pass (only needed once —
    the features do not change between steps)."""
    import numpy as np

    k = len(feature_cols)
    eta = F.lit(float(beta[0]))
    for b, x in zip(beta[1:], xs):
        eta = eta + F.lit(float(b)) * x
    p_raw = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    P = F.round(p_raw * 1_000_000, 0).cast("long")
    P = F.least(F.greatest(P, F.lit(1)), F.lit(999_999))
    ws = (P * (F.lit(1_000_000) - P)).cast("decimal(38,0)")
    xl = [F.lit(1)] + [x.cast("long") for x in xs]
    aggs = []
    for i in range(k + 1):
        for j in range(i, k + 1):
            aggs.append(
                F.sum(ws * xl[i] * xl[j]).alias(f"a_{i}_{j}")
            )
    # exact long in the 1e-6 domain; widened to decimal(38,0)
    # BEFORE the sum so the gradient terms carry the same
    # no-silent-wrap guarantee as the a_ij terms (a plain BIGINT
    # sum wraps at ~1e19 corpus x feature mass under non-ANSI
    # mode, diverging from the oracle's HUGEINT sum)
    resid = (y6 - P).cast("decimal(19,0)")
    for i in range(k + 1):
        aggs.append(
            F.sum(xl[i].cast("decimal(19,0)") * resid).alias(f"c_{i}")
        )
    if check_integral:
        # integrality guard, same pass: a fractional feature would be
        # truncated by the long cast (DuckDB rounds — cross-engine
        # divergence), so refuse it outright
        for i, x in enumerate(xs):
            aggs.append(
                F.sum((x != F.floor(x)).cast("int")).alias(f"frac_{i}")
            )
    row = clean.agg(*aggs).collect()[0]
    if row["a_0_0"] is None:
        raise ValueError(
            "fit_logistic_probe: no rows survive the NULL drop"
        )
    if check_integral:
        bad = [
            feature_cols[i]
            for i in range(k)
            if (row[f"frac_{i}"] or 0) > 0
        ]
        if bad:
            raise ValueError(
                "fit_logistic_probe: non-integral feature values in "
                f"{bad} — features must be integer-valued (scale to an "
                "integer grid, e.g. round(ratio * 1e6), first)"
            )
    a = np.empty((k + 1, k + 1))
    for i in range(k + 1):
        for j in range(i, k + 1):
            a[i, j] = a[j, i] = float(row[f"a_{i}_{j}"])
    c = np.array([float(row[f"c_{i}"]) for i in range(k + 1)])
    if k == 1:
        # explicit 2x2 closed form, formula text mirrored by the
        # SQL oracle (ORACLE_PROBE_LOGISTIC_FIT) so the float ops
        # run in the same order on both engines
        s0, s1, s2 = a[0, 0], a[0, 1], a[1, 1]
        b0, b1 = beta
        t0 = (s0 * b0 + s1 * b1) * 1e-12 + c[0] * 1e-6
        t1 = (s1 * b0 + s2 * b1) * 1e-12 + c[1] * 1e-6
        det = s0 * s2 - s1 * s1
        if det == 0.0:
            raise ValueError(
                "fit_logistic_probe: singular IRLS system"
            )
        return [
            round(((s2 * t0 - s1 * t1) / det) * 1e12, beta_round),
            round(((s0 * t1 - s1 * t0) / det) * 1e12, beta_round),
        ]
    xtwx = a * 1e-12
    xtwz = xtwx @ np.array(beta) + c * 1e-6
    try:
        nb = np.linalg.solve(xtwx, xtwz)
    except np.linalg.LinAlgError as exc:
        raise ValueError(
            "fit_logistic_probe: singular IRLS system — "
            "collinear features"
        ) from exc
    return [round(float(b), beta_round) for b in nb]


def fit_logistic_probe_converged(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    tol: float = 1e-6,
    max_iterations: int = 25,
    beta_round: int = 10,
) -> tuple[list[float], int, bool]:
    """IRLS logistic fit TO A TOLERANCE -> (betas, iterations_run,
    converged) — the convergence contract the graph family
    standardized (``pagerank_converged`` etc.): iterate Newton steps
    until max|Δβ| < ``tol`` or ``max_iterations`` is hit, and SAY
    which happened instead of letting a truncated fit masquerade as a
    converged one. The fixed-``iterations`` ``fit_logistic_probe``
    stays pinned for the bit-replayable oracle; real curation use
    wants this form (IRLS on a well-posed probe typically converges
    in 4-8 steps — each step is the same single scan-and-reduce pass,
    so cost is iterations x one corpus scan, nothing stateful).

    Tolerance floor, measured not guessed: the 1e-6 probability
    quantization that buys cross-engine bit-determinism also injects
    a NOISE FLOOR — near the optimum the quantized gradient dithers
    by up to half a probability ulp per row, so successive betas
    chatter in a data-dependent band (empirically ~1e-8..5e-7 on a
    200-row k=1 probe) and never settle further. The default
    ``tol=1e-6`` sits at the quantization scale and converges in
    single-digit steps on well-posed probes; a much tighter tol can
    chatter to the iteration cap and honestly report
    converged=False. ``tol`` below 10^-``beta_round`` can NEVER be
    reached (betas are rounded between steps) and raises. Also
    honest: on separable data the logistic MLE does not exist (betas
    diverge) — the cap truncates and converged=False says so."""
    k = len(feature_cols)
    if k == 0:
        raise ValueError("fit_logistic_probe_converged needs features")
    if max_iterations < 1:
        raise ValueError("max_iterations must be >= 1")
    if tol < 10.0 ** (-beta_round):
        raise ValueError(
            f"tol={tol} is below the between-step rounding grid "
            f"10^-{beta_round}; raise tol or beta_round"
        )
    clean, xs, y6 = _irls_prepared(df, feature_cols, label_col)
    beta = [0.0] * (k + 1)
    converged = False
    its = 0
    try:
        for it in range(max_iterations):
            nb = _irls_step(
                clean, xs, y6, feature_cols, beta, beta_round,
                check_integral=(it == 0),
            )
            its = it + 1
            delta = max(abs(n - b) for n, b in zip(nb, beta))
            beta = nb
            if delta < tol:
                converged = True
                break
    finally:
        clean.unpersist(False)
    return [float(b) for b in beta], its, converged


def score_logistic(
    feature_cols: list[str | Column],
    betas: list[float],
) -> Column:
    """``sigmoid(betas . [1, features])`` as one codegen'd column
    expression — the probability scoring pass, map-only at any
    corpus size (coefficients are plan literals)."""
    eta = score_linear(feature_cols, betas)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))


__all__ = [
    "fit_linear_probe",
    "fit_logistic_probe",
    "fit_logistic_probe_converged",
    "score_linear",
    "score_logistic",
]
