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
    payload_cols: Sequence[str] | None = None,
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

    ``payload_cols`` (optional) appends those columns taken from the
    CURRENT side — the new values for I/U rows, NULL for D rows — which
    makes the changelog self-contained: ``apply_changes(base, diff)``
    reconstructs ``current`` exactly (round-tripped in tests).
    """
    keys = list(key_cols)
    payload = list(payload_cols or ())
    cur_extra = [c for c in payload if c not in compare_cols]
    b = base.select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        *[F.col(c).alias(f"_b_{c}") for c in compare_cols],
        F.lit(1).alias("_in_base"),
    )
    c = current.select(
        *[F.col(k).alias(f"_ck_{k}") for k in keys],
        *[F.col(c).alias(f"_c_{c}") for c in compare_cols],
        *[F.col(c).alias(f"_cx_{c}") for c in cur_extra],
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
    payload_out = [
        (F.col(f"_c_{c}") if c in compare_cols else F.col(f"_cx_{c}")).alias(c)
        for c in payload
    ]
    return (
        j.select(
            *out_keys,
            op.alias("op"),
            F.when(op == "U", n_changed).otherwise(F.lit(0)).alias("n_changed"),
            F.when(op == "U", changed_cols).otherwise(F.lit("")).alias(
                "changed_cols"
            ),
            *payload_out,
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


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """Apply an I/U/D changelog (the ``snapshot_diff`` output with
    ``payload_cols``) to a target snapshot, returning the new snapshot.

    Semantics: every changed key's old row is dropped (ONE anti-join on
    null-safe key equality), then the I/U payload rows are unioned in —
    so an update whose key moved partitions, a delete, and an insert
    are all the same plan. Idempotent: re-applying the same changelog
    is a no-op (the anti-join removes the row the previous apply wrote,
    and the union writes it back identically).

    Scale (100 TB): one shuffle-join of target x changelog on the key
    (AQE broadcasts the changelog side in the incremental case where
    deltas are small) + a union. Pair with dynamic partition overwrite
    (operators/merge.py:merge_overwrite_partitions shows the writer
    shape) to rewrite only partitions holding changed keys.
    """
    keys = list(key_cols)
    chg_keys = changes.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys]
    ).dropDuplicates()
    cond = None
    for k in keys:
        eq = F.col(k).eqNullSafe(F.col(f"_k_{k}"))
        cond = eq if cond is None else cond & eq
    kept = target.join(chg_keys, cond, "left_anti")
    upserts = changes.filter(F.col("op") != "D").select(*keys, *payload_cols)
    return kept.select(*keys, *payload_cols).unionByName(upserts)
