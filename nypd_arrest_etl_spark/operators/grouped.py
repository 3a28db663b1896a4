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


def ngram_udtf_class():
    """Native Python UDTF (Spark 4 ``udtf``): one input row -> N output
    rows, the table-function shape that ``explode``-style built-ins
    cover for arrays but not for arbitrary Python row expansion.

    Kept deliberately tiny: the engine's standing rule is that
    anything expressible as column expressions stays JVM-side
    (with_shingles does this same n-gram expansion with array
    lambdas); the UDTF exists to expose the surface for expansions
    that genuinely need Python, and its eval runs per-row Python — use
    mapInPandas when the expansion is vectorizable."""

    class NgramUDTF:
        def eval(self, doc_id: int, text: str, n: int):
            toks = (text or "").split()
            for i in range(max(len(toks) - n + 1, 0)):
                yield doc_id, " ".join(toks[i : i + n])

    return NgramUDTF


def ngrams_via_udtf(
    df: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Expand documents to (doc_id, ngram) rows through the UDTF,
    applied with SQL LATERAL (a UDTF is a table function, not a column
    expression — each input row drives one eval() producing N rows).
    Registration is lazy so importing this module never needs a live
    session."""
    from pyspark.sql.functions import udtf

    spark = df.sparkSession
    spark.udtf.register("ngram_udtf", udtf(ngram_udtf_class(), returnType="doc_id long, ngram string"))
    df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        f"SELECT g.doc_id, g.ngram FROM __udtf_docs, LATERAL ngram_udtf(doc_id, text, {int(n)}) g"
    )


def group_stats_arrow(
    df: DataFrame, key_col: str, val_col: str, round_to: int = 2
) -> DataFrame:
    """Per-group stats via ``applyInArrow`` — the Arrow-NATIVE grouped
    UDF surface (Spark 4): each group arrives as a ``pyarrow.Table``
    and is reduced with pyarrow.compute kernels, skipping the
    Arrow->pandas->Arrow conversion ``applyInPandas`` pays on both
    edges. For numeric reductions that conversion is the dominant
    cost, so this is the preferred shape for custom per-group numerics
    that built-in aggs can't express. One shuffle on the group key."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(key: tuple, table: "pa.Table") -> "pa.Table":
        col = table.column(val_col)
        return pa.table(
            {
                key_col: [key[0]],
                "n": [table.num_rows],
                "total": [pc.sum(col).as_py() or 0.0],
                "vmin": [pc.min(col).as_py()],
                "vmax": [pc.max(col).as_py()],
            }
        )

    key_type = dict(df.dtypes)[key_col]
    out = df.groupBy(key_col).applyInArrow(
        stats, schema=f"{key_col} {key_type}, n long, total double, vmin double, vmax double"
    )
    # Round JVM-side: Python's round() is banker's (half-to-even) while
    # F.round and the DuckDB oracles round half away from zero — one
    # convention everywhere, so the kernel emits the raw sum.
    return out.withColumn("total", F.round("total", round_to))
