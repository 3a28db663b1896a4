"""Grouped Python-UDF surface (SURVEY.md §2i): the two shapes the
engine exposes beyond scalar Pandas UDFs.

- ``applyInPandas`` (grouped map): whole-group pandas transform —
  here, per-group embedding centroids. Each group becomes one Arrow
  batch in one Python worker; state is bounded by group size, so keys
  must be finer than executor memory at scale (our group key is a
  bounded hash bucket).
- ``pandas_udf(..., GROUPED_AGG)``: vectorized aggregate — here, an
  exact median, which Spark has no built-in exact aggregate for
  (percentile_approx is approximate).

Both run Arrow-batched (no per-row Python), the engine's standing rule
for unavoidable Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_centroids(
    df: DataFrame,
    n_groups: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-bucket embedding centroid, emitted one row per dimension
    (long format hashes stably across engines; an array column's
    float repr would not).

    Output: (grp, dim, centroid) — centroid rounded to 6 places.
    """

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf["vec"].to_numpy()).astype("float64")
        mean = mat.mean(axis=0)
        return pd.DataFrame(
            {
                "grp": pdf["grp"].iloc[0],
                "dim": np.arange(mean.shape[0], dtype="int32"),
                "centroid": np.round(mean, 6),
            }
        )

    v = df.select(
        (F.col(id_col) % n_groups).alias("grp"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("vec"),
    )
    return v.groupBy("grp").applyInPandas(
        centroid, schema="grp long, dim int, centroid double"
    )


def grouped_median(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "median"
) -> DataFrame:
    """Exact per-group median via a GROUPED_AGG Pandas UDF
    (linear-interpolated for even counts, matching SQL ``median``)."""

    @F.pandas_udf("double")
    def _median(v: pd.Series) -> float:
        return float(v.median())

    return df.groupBy(group_col).agg(
        F.round(_median(value_col), 2).alias(out_col)
    )
