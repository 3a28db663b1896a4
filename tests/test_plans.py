"""Physical-plan shape assertions: the optimizations the 100 TB design
relies on must actually appear in the executed plans — filter pushdown
to parquet, broadcast joins for dims, TakeOrderedAndProject for top-k,
rank-limit pushdown for windowed top-n, no nested-loop joins anywhere
in the declared relational set."""

import pytest

from nypd_arrest_etl_spark.plans import queries as Q


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pricing_summary_pushes_filter_and_prunes_columns(spark, sf_dir):
    df = Q.q_pricing_summary(spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: the scan must not read all 16 lineitem columns
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in scan_line and "l_orderkey" not in scan_line


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(Q.q_revenue_by_nation(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_top_k_plans_take_ordered(spark, sf_dir):
    plan = _plan(Q.q_top_customers(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_window_top_n_pushes_group_limit(spark, sf_dir):
    plan = _plan(Q.q_top_orders_per_customer(spark, sf_dir))
    assert "WindowGroupLimit" in plan


@pytest.mark.slow  # >15s: excluded from the default gate run
def test_no_nested_loop_in_declared_relational_queries(spark, sf_dir):
    for name, (fn, _sql) in Q.RELATIONAL.items():
        plan = _plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_clean_pushes_required_key_filters_to_scan(spark, tmp_path):
    import json

    from nypd_arrest_etl_spark.operators.clean import clean
    from nypd_arrest_etl_spark.schema import RAW_SCHEMA

    p = tmp_path / "raw.json"
    p.write_text(json.dumps({"arrest_key": "K1", "arrest_date": "2024-01-05"}) + "\n")
    # explicit-schema scan path (predicate pushdown applies to sources)
    df = clean(spark.read.schema(RAW_SCHEMA).json(str(p)))
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # arrest_date's null guard pushes to the scan; arrest_key's cannot
    # (its filter applies to the post-scrub CASE value, by design).
    assert "PushedFilters: [IsNotNull(arrest_date)]" in plan
    # T1-T12 fuse into ONE codegen stage: a narrow, shuffle-free map
    assert "[codegen id : 1]" in plan
    assert "[codegen id : 2]" not in plan
    assert "Exchange" not in plan


def test_subqueries_decorrelate_to_hash_joins(spark, sf_dir):
    """EXISTS / NOT EXISTS must plan as semi/anti hash joins, never as
    per-row subquery re-execution or a nested loop."""
    plan = _plan(Q.q_late_order_priority(spark, sf_dir))
    assert "LeftSemi" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    plan = _plan(Q.q_idle_rich_customers(spark, sf_dir))
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_shapes_plan_as_designed(spark, sf_dir):
    # Q10/Q18 adaptations: top-k must avoid a global sort.
    assert "TakeOrderedAndProject" in _plan(Q.q_returned_items(spark, sf_dir))
    assert "TakeOrderedAndProject" in _plan(Q.q_large_orders(spark, sf_dir))
    # Q16 adaptation: the NOT IN denylist (null-free) must plan as a
    # broadcast anti-join, never a null-aware nested loop.
    plan = _plan(Q.q_supplier_counts(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # Q7 adaptation: both nation sides broadcast.
    assert _plan(Q.q_volume_shipping(spark, sf_dir)).count("BroadcastHashJoin") >= 3


def test_sole_returning_supplier_decorrelates_to_single_agg(spark, sf_dir):
    # Round-4 shape: the EXISTS / NOT EXISTS pair AND the outer probe
    # all derive from ONE per-(order, supplier) aggregate + an order
    # window — exactly 1 lineitem scan total (was 2 after the round-3
    # decorrelation, 3 naively with one scan per correlated subquery).
    plan = _optimized(Q.q_sole_returning_supplier(spark, sf_dir))
    scans = [l for l in plan.splitlines() if "Relation [l_orderkey" in l]
    assert len(scans) == 1


def test_q6_is_scan_filter_agg_only(spark, sf_dir):
    # Q6 shape: every predicate reaches the parquet scan; no join, no
    # window — the plan is scan -> partial agg -> exchange -> final agg.
    plan = _plan(Q.q_forecast_revenue(spark, sf_dir))
    assert "PushedFilters" in plan and "GreaterThanOrEqual(l_shipda" in plan
    assert "Join" not in plan


def test_q13_left_outer_keeps_residual_below_join(spark, sf_dir):
    # The priority exclusion is a right-side-only predicate of a LEFT
    # OUTER join, so Catalyst pushes it below the join to the orders
    # scan (legal: it can't drop preserved-side rows there). It must
    # NOT appear as a post-join filter — that would silently drop the
    # zero-order customers the outer join exists to keep.
    plan = _optimized(Q.q_customer_distribution(spark, sf_dir))
    assert "LeftOuter" in plan
    join_seen = False
    for line in plan.splitlines():
        if "LeftOuter" in line:
            join_seen = True
        if "o_orderpriority" in line and "Filter" in line:
            assert join_seen, "priority filter must sit below the outer join"


def test_q15_max_revenue_joins_broadcast(spark, sf_dir):
    # The one-row max relation must broadcast back onto the revenue
    # relation (never a driver collect, never a nested loop).
    plan = _plan(Q.q_top_supplier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q2_min_cost_uses_single_cost_relation(spark, sf_dir):
    # The window-MIN rewrite scans lineitem once; the correlated-form
    # oracle scans it twice. One scan + one Window, no self-join.
    plan = _optimized(Q.q_min_cost_supplier(spark, sf_dir))
    scans = [l for l in plan.splitlines() if "Relation [l_orderkey" in l]
    assert len(scans) == 1
    assert "Window" in plan


def test_q20_semi_join_after_having(spark, sf_dir):
    plan = _plan(Q.q_potential_promotion(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
