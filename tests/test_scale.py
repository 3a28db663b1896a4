"""Scale-hardening operators: salted skew join, bucketed co-located
join (no-Exchange plan), bloom-filter semi-join pruning."""

import pytest
from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators.scale import (

    bloom_prune,
    salted_join,
    write_bucketed,
)

# Long-running suite (streaming drains / live servers / storage-format
# e2e / property fuzz / soak): excluded from the default gate run by
# pytest.ini's `-m "not slow"`; run with -m "" or SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow



def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_salted_join_matches_plain_inner(spark, sf_dir):
    li = _lineitem(spark, sf_dir).select("l_orderkey", "l_quantity")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_orderpriority")
    o = o.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(o, ["l_orderkey"], "inner")
    salted = salted_join(li, o, ["l_orderkey"], "inner", salt_buckets=4)
    assert salted.count() == plain.count()
    a = plain.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    )
    b = salted.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_salted_join_left_preserves_unmatched(spark):
    # one hot key (x1000) + one unmatched key on the skewed side
    left = spark.range(1000).select(F.lit(1).alias("k"), F.col("id").alias("v")).union(
        spark.range(1).select(F.lit(99).alias("k"), F.lit(-1).alias("v"))
    )
    right = spark.createDataFrame([(1, "hot")], "k int, name string")
    out = salted_join(left, right, ["k"], "left", salt_buckets=8)
    assert out.count() == 1001
    assert out.filter("k = 99").collect()[0]["name"] is None
    # inner would drop the unmatched row and keep all 1000 hot matches
    assert salted_join(left, right, ["k"], "inner", salt_buckets=8).count() == 1000


def test_salted_join_rejects_row_dropping_sides(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], "right")


def test_bucketed_join_plans_without_exchange(spark, sf_dir, tmp_path):
    li = _lineitem(spark, sf_dir).select("l_orderkey", "l_quantity")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", "l_orderkey", 4, path=str(tmp_path / "li"))
    write_bucketed(o, "b_orders", "o_orderkey", 4, path=str(tmp_path / "o"))
    try:
        bl = spark.table("b_lineitem")
        bo = spark.table("b_orders")
        # force SMJ so the assert is about bucketing, not broadcast
        j = bl.hint("merge").join(bo, bl.l_orderkey == bo.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # same rows as the unbucketed join
        assert j.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bloom_prune_keeps_exactly_the_join_survivors(spark, sf_dir):
    li = _lineitem(spark, sf_dir).select("l_partkey", "l_quantity")
    dim = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_size") <= 5)
        .select("p_partkey")
    )
    pruned = bloom_prune(li, dim, "l_partkey", "p_partkey")
    # no false negatives: join result identical through the pruned scan
    dim_r = dim.withColumnRenamed("p_partkey", "l_partkey")
    plain = li.join(dim_r, ["l_partkey"]).count()
    via_pruned = pruned.join(dim_r, ["l_partkey"]).count()
    assert via_pruned == plain
    # and it actually prunes (selective dim -> far fewer fact rows)
    n_all, n_pruned = li.count(), pruned.count()
    assert n_pruned < n_all
    # every surviving row might match; misses are only false positives
    assert n_pruned >= plain


def test_sketch_stats_within_error_bounds(spark, sf_dir):
    """HLL++ distinct counts land within ~3x the configured rsd of the
    exact answers; approximate percentiles land inside the exact value
    range for the group (sanity, not a distributional guarantee)."""
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.plans.queries import q_sketch_stats_native, t

    got = {r["l_returnflag"]: r for r in q_sketch_stats_native(spark, sf_dir).collect()}
    li = t(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd_parts"),
            F.countDistinct("l_orderkey").alias("nd_orders"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, e in exact.items():
        g = got[flag]
        assert abs(g["nd_parts_approx"] - e["nd_parts"]) <= 0.06 * e["nd_parts"] + 1
        assert abs(g["nd_orders_approx"] - e["nd_orders"]) <= 0.06 * e["nd_orders"] + 1
        assert e["lo"] <= g["p50_price_approx"] <= g["p99_price_approx"] <= e["hi"]


def test_kmv_sketch_stats_accuracy(spark, sf_dir):
    """The portable KMV estimate lands within ~3 standard errors
    (rsd ~ 1/sqrt(K-2) ~ 6.3% at K=256) of the exact distinct counts,
    and the discrete percentiles are exact order statistics inside the
    group's value range."""
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.plans.queries import q_sketch_stats, t

    got = {r["l_returnflag"]: r for r in q_sketch_stats(spark, sf_dir).collect()}
    li = t(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd_parts"),
            F.countDistinct("l_orderkey").alias("nd_orders"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, e in exact.items():
        g = got[flag]
        assert abs(g["nd_parts_kmv"] - e["nd_parts"]) <= 0.2 * e["nd_parts"] + 1
        assert abs(g["nd_orders_kmv"] - e["nd_orders"]) <= 0.2 * e["nd_orders"] + 1
        assert e["lo"] <= g["p50_price"] <= g["p99_price"] <= e["hi"]


def test_kmv_exact_below_k(spark):
    """Groups with fewer than K distinct keys report the exact count."""
    from nypd_arrest_etl_spark.operators.scale import kmv_distinct

    df = spark.range(100).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 30).alias("k")
    )
    got = {r["g"]: r["kmv_est"] for r in kmv_distinct(df, "k", ["g"], k=256).collect()}
    assert got == {0: 15.0, 1: 15.0}


def test_zorder_layout_tightens_per_file_stats(spark, sf_dir, tmp_path):
    from nypd_arrest_etl_spark.operators.scale import write_zordered

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )

    def spread_per_file(path):
        df = spark.read.parquet(path).withColumn("f", F.input_file_name())
        stats = df.groupBy("f").agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("rp"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("rs"),
        )
        row = stats.agg(F.avg("rp").alias("ap"), F.avg("rs").alias("as_")).first()
        return row.ap, row.as_

    zed = str(tmp_path / "zed")
    write_zordered(li, zed, ["l_partkey", "l_suppkey"], n_files=8, bits_per_col=4)

    # baseline = the GLOBAL ranges, not a measured round-robin layout:
    # repartition(8) starts round-robin at a random partition, so a
    # measured "plain" spread varies run to run (observed flaking in
    # full-suite runs); a random row placement's expected per-file
    # spread is ~the full range anyway, which IS the global range
    full = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("rp"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("rs"),
    ).first()
    zp, zs = spread_per_file(zed)
    # interleaving clusters BOTH dimensions at once: each file's
    # min/max window shrinks on both columns, not just the leading
    # one (l_suppkey has ~10 distinct values at this sf, so its
    # achievable shrink is coarser than the high-cardinality partkey)
    assert zp < full.rp * 0.5
    assert zs < full.rs * 0.75
    # layout change only — same rows
    assert spark.read.parquet(zed).count() == li.count()


def test_compact_files_merges_small_files(spark, tmp_path):
    from nypd_arrest_etl_spark.operators.scale import compact_files

    src = str(tmp_path / "tiny")
    dst = str(tmp_path / "compacted")
    spark.range(10_000).repartition(64).write.parquet(src)
    before, after = compact_files(spark, src, dst, target_file_bytes=10 * 1024 * 1024)
    assert before == 64 and after < 8
    got = spark.read.parquet(dst)
    assert got.count() == 10_000
    assert got.agg(F.sum("id")).first()[0] == sum(range(10_000))


def test_kmv_overlap_exact_below_k(spark):
    from nypd_arrest_etl_spark.operators.scale import kmv_overlap

    # A = {0..19}, B = {10..29}: |A∪B|=30, |A∩B|=10, J=1/3 — sketches
    # not full at k=128, so every figure is exact.
    rows = [(f"v{i}", "A") for i in range(20)] + [(f"v{i}", "B") for i in range(10, 30)]
    df = spark.createDataFrame(rows, ["key", "grp"])
    out = kmv_overlap(df, "key", "grp", k=128).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.group_a, r.group_b) == ("A", "B")
    assert r.union_est == 30.0
    assert r.inter_est == 10.0
    assert r.jaccard_est == round(10 / 30, 6)


def test_kmv_overlap_estimates_within_bounds_when_full(spark):
    from nypd_arrest_etl_spark.operators.scale import kmv_overlap

    # 2000 distinct keys per group, 1000 shared: truth U=3000, J=1/3.
    # k=512 -> sd(U)/U = 1/sqrt(k-2) ≈ 4.4%, sd(J)/J ≈ 4.5%; the draw
    # is DETERMINISTIC (one fixed hash), so assert ~3.5σ envelopes.
    a = [(f"k{i}", "A") for i in range(2000)]
    b = [(f"k{i}", "B") for i in range(1000, 3000)]
    df = spark.createDataFrame(a + b, ["key", "grp"])
    r = kmv_overlap(df, "key", "grp", k=512).collect()[0]
    assert abs(r.union_est - 3000) / 3000 < 0.15
    assert abs(r.jaccard_est - 1 / 3) / (1 / 3) < 0.15
    assert abs(r.inter_est - 1000) / 1000 < 0.25  # product of two estimates


def test_kmv_overlap_all_pairs_and_null_keys_ignored(spark):
    from nypd_arrest_etl_spark.operators.scale import kmv_overlap

    rows = [(f"x{i}", g) for g in ("A", "B", "C") for i in range(5)] + [(None, "A")]
    df = spark.createDataFrame(rows, ["key", "grp"])
    out = {(r.group_a, r.group_b): r for r in kmv_overlap(df, "key", "grp").collect()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    # identical 5-element sets -> exact full overlap on every pair
    for r in out.values():
        assert r.union_est == 5.0 and r.inter_est == 5.0 and r.jaccard_est == 1.0
