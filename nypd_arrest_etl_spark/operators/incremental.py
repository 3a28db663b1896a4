"""Incremental-maintenance operators: snapshot differencing (CDC
changelog derivation) and partial-aggregate merge (materialized-view
refresh without rescanning the base).

Reference parity: the reference pipeline re-extracts since a
high-watermark and upserts (scripts/extract.py probe + load.py merge).
These operators generalize that incremental contract to the two shapes
a warehouse actually needs at 100 TB:

- ``snapshot_diff`` turns two table snapshots into an I/U/D changelog
  — the step that lets every downstream consumer process only deltas
  instead of full snapshots.
- ``merge_agg_partials`` refreshes an aggregate from (base partials +
  delta partials) in O(groups) instead of O(rows) — the
  count/sum/min/max family is mergeable, so a 100 TB base table is
  never rescanned.

Scale notes (100 TB):
- ``snapshot_diff`` is ONE full-outer join co-partitioned on the key.
  With both snapshots bucketed on the key it is an exchange-free
  sort-merge join; with date-partitioned snapshots, diff only the
  partitions whose files changed (partition pruning applies to both
  sides because the key filter is pushed to each scan).
- ``merge_agg_partials`` shuffles only the partial-agg rows (one per
  group per input), never the fact rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    base: DataFrame,
    current: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """I/U/D changelog between two snapshots of the same table.

    Output: key columns, ``op`` ('I' row only in ``current``, 'D' row
    only in ``base``, 'U' key in both with at least one ``compare_cols``
    difference), ``n_changed`` and ``changed_cols`` (comma-joined sorted
    names; empty for I/D where the row-level change subsumes columns).
    Unchanged keys are dropped. NULL-safe: a NULL->value or value->NULL
    transition in a compare column counts as a change (eqNullSafe), and
    NULL key components join positionally like values do in the
    changelog contract (full-outer join with null-safe key equality).
    """
    keys = list(key_cols)
    b = base.select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        *[F.col(c).alias(f"_b_{c}") for c in compare_cols],
        F.lit(1).alias("_in_base"),
    )
    c = current.select(
        *[F.col(k).alias(f"_ck_{k}") for k in keys],
        *[F.col(c).alias(f"_c_{c}") for c in compare_cols],
        F.lit(1).alias("_in_cur"),
    )
    # Null-safe key equality: a NULL key value matches itself, so a row
    # with a NULL key component diffs against its counterpart instead of
    # fanning out into a spurious D + I pair.
    cond = None
    for k in keys:
        eq = F.col(f"_bk_{k}").eqNullSafe(F.col(f"_ck_{k}"))
        cond = eq if cond is None else cond & eq
    j = b.join(c, cond, "full_outer")

    changed_flags: list[Column] = [
        (~F.col(f"_b_{cc}").eqNullSafe(F.col(f"_c_{cc}"))).alias(cc)
        for cc in compare_cols
    ]
    n_changed = sum(
        (flag.cast("int") for flag in changed_flags), F.lit(0)
    ).alias("n_changed")
    changed_cols = F.concat_ws(
        ",",
        *[
            F.when(~F.col(f"_b_{cc}").eqNullSafe(F.col(f"_c_{cc}")), F.lit(cc))
            for cc in sorted(compare_cols)
        ],
    )

    op = (
        F.when(F.col("_in_base").isNull(), F.lit("I"))
        .when(F.col("_in_cur").isNull(), F.lit("D"))
        .when(n_changed > 0, F.lit("U"))
    )  # NULL => unchanged, filtered below

    out_keys = [
        F.coalesce(F.col(f"_ck_{k}"), F.col(f"_bk_{k}")).alias(k) for k in keys
    ]
    return (
        j.select(
            *out_keys,
            op.alias("op"),
            F.when(op == "U", n_changed).otherwise(F.lit(0)).alias("n_changed"),
            F.when(op == "U", changed_cols).otherwise(F.lit("")).alias(
                "changed_cols"
            ),
        )
        .filter(F.col("op").isNotNull())
    )


def merge_agg_partials(
    partials: Sequence[DataFrame],
    group_cols: Sequence[str],
    count_col: str = "n",
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge pre-aggregated partials (base + any number of deltas) into
    the refreshed aggregate: counts and sums add, mins/maxes fold.

    Every input must already carry ``group_cols`` + the named measure
    columns (the output schema of the same aggregation run on a slice
    of the fact table). The merge is a union of O(groups)-sized frames
    followed by one groupBy — the fact table is never touched, which is
    the entire point of incremental view maintenance at 100 TB.
    """
    unioned = partials[0]
    for p in partials[1:]:
        unioned = unioned.unionByName(p)
    aggs = [F.sum(count_col).alias(count_col)]
    aggs += [F.sum(c).alias(c) for c in sum_cols]
    aggs += [F.min(c).alias(c) for c in min_cols]
    aggs += [F.max(c).alias(c) for c in max_cols]
    return unioned.groupBy(*group_cols).agg(*aggs)
