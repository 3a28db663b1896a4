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


__all__ = ["fit_linear_probe", "score_linear"]
