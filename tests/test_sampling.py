"""Deterministic sampling + profiling semantics."""

import pytest
from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators import sampling as S


def test_hash_sample_is_deterministic_and_near_fraction(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    a = S.hash_sample(df, "k", 0.25, salt=1)
    b = S.hash_sample(df, "k", 0.25, salt=1)
    assert a.count() == b.count()
    assert {r.k for r in a.collect()} == {r.k for r in b.collect()}
    # uniform hash: observed fraction close to requested
    assert abs(a.count() / 20_000 - 0.25) < 0.02
    # a different salt draws a (mostly) different sample
    c = S.hash_sample(df, "k", 0.25, salt=2)
    overlap = a.join(c, "k").count()
    assert overlap < a.count() * 0.5


def test_hash_sample_fraction_nests(spark):
    # hash-threshold sampling is nested: the 10% sample is a subset of
    # the 30% sample under the same salt (rerun/backfill stability)
    df = spark.range(10_000).withColumnRenamed("id", "k")
    small = {r.k for r in S.hash_sample(df, "k", 0.1, salt=3).collect()}
    big = {r.k for r in S.hash_sample(df, "k", 0.3, salt=3).collect()}
    assert small <= big


def test_stratified_fractions_apply_per_stratum(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(10_000)]
    df = spark.createDataFrame(rows, "k long, lang string")
    out = S.stratified_hash_sample(
        df, "k", "lang", {"en": 0.4, "de": 0.1}, default_fraction=0.0, salt=5
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(got["en"] / 5_000 - 0.4) < 0.04
    assert abs(got["de"] / 5_000 - 0.1) < 0.04


def test_sample_filter_reaches_the_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        S.hash_sample(docs, "doc_id", 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the hash predicate is a filter directly over the file scan —
    # no shuffle, no sample operator, nothing blocking pushdown
    assert "Exchange" not in plan and "Sample" not in plan


def test_profile_columns_counts(spark):
    rows = [(1, "a"), (2, "a"), (3, None), (4, "b")]
    df = spark.createDataFrame(rows, "k long, v string")
    out = {r.column_name: r for r in S.profile_columns(df, ["k", "v"]).collect()}
    assert out["k"].n_rows == 4 and out["k"].n_nulls == 0 and out["k"].n_distinct == 4
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 2


def test_profile_is_single_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        S.profile_columns(docs, ["lang", "source"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Relation [doc_id") == 1


def test_shuffle_deterministic_is_seed_stable_and_total(spark):
    from nypd_arrest_etl_spark.operators.sampling import shuffle_deterministic

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    o1 = [r["doc_id"] for r in shuffle_deterministic(df, "doc_id", seed=3).collect()]
    o2 = [r["doc_id"] for r in shuffle_deterministic(df, "doc_id", seed=3).collect()]
    o3 = [r["doc_id"] for r in shuffle_deterministic(df, "doc_id", seed=4).collect()]
    assert o1 == o2, "same seed must reproduce the permutation"
    assert o1 != o3, "different seed must change the permutation"
    assert sorted(o1) == list(range(200)) and o1 != list(range(200))


def test_check_constraints_single_scan_and_null_as_violation(spark):
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.operators.sampling import check_constraints

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "id long, v double"
    )
    out = {r["rule"]: r for r in check_constraints(
        df, {"v_nonneg": F.col("v") >= 0, "id_low": F.col("id") <= 2}
    ).collect()}
    # NULL >= 0 is UNKNOWN -> violation (explicit 3VL)
    assert out["v_nonneg"]["n_violations"] == 2
    assert out["v_nonneg"]["violation_rate"] == round(2 / 3, 6)
    assert out["id_low"]["n_violations"] == 1


def test_oversample_mixture_copies(spark):
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.operators.sampling import oversample_mixture

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, "a").otherwise("b").alias("src"),
    )
    out = oversample_mixture(
        df, "doc_id", "src", weights={"a": 2.5, "b": 0.4}, salt=3
    )
    per = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # a: every row 2x + ~half a third time; b: ~40% of rows once
    assert 2 * 500 + 150 <= per["a"] <= 2 * 500 + 350
    assert 120 <= per["b"] <= 280
    # copy_idx dense from 0 per row; deterministic across partitionings
    a = sorted(map(tuple, out.select("doc_id", "copy_idx").collect()))
    b2 = sorted(map(tuple, oversample_mixture(
        df.repartition(7), "doc_id", "src", weights={"a": 2.5, "b": 0.4}, salt=3
    ).select("doc_id", "copy_idx").collect()))
    assert a == b2
    base = out.filter("src = 'a'").groupBy("doc_id").count().select("count").distinct()
    assert {r["count"] for r in base.collect()} <= {2, 3}


def test_drift_report_psi(spark):
    import math

    import pytest

    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.operators.sampling import drift_report

    ref = spark.createDataFrame([("a",)] * 8 + [("b",)] * 2, "c string")
    cur = spark.createDataFrame([("a",)] * 5 + [("b",)] * 4 + [("z",)], "c string")
    out = {r["category"]: r for r in drift_report(ref, cur, "c").collect()}
    assert out["a"]["p_ref"] == 0.8 and out["a"]["p_cur"] == 0.5
    exp_a = (0.5 + 1e-6 - (0.8 + 1e-6)) * math.log((0.5 + 1e-6) / (0.8 + 1e-6))
    assert out["a"]["psi"] == pytest.approx(exp_a, abs=1e-6)
    # category present only in the current snapshot: finite penalty
    assert out["z"]["n_ref"] == 0 and out["z"]["n_cur"] == 1
    assert out["z"]["psi"] > 0.5
    total_psi = sum(r["psi"] for r in out.values())
    assert total_psi > 0.2  # the conventional drifted threshold


def test_dsir_prefers_target_like_docs(spark):
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.operators.sampling import importance_resample_dsir

    # target domain speaks vocab {alpha..delta}; raw pool has 3 docs in
    # that vocab and 3 in a disjoint one — DSIR must rank the
    # target-like raw docs first and never return target rows.
    rows = [
        (0, "t", "alpha beta gamma delta alpha beta"),
        (1, "t", "beta alpha delta gamma beta alpha"),
        (10, "r", "alpha beta gamma delta gamma"),
        (11, "r", "delta gamma beta alpha alpha"),
        (12, "r", "alpha delta beta gamma beta"),
        (20, "r", "zulu yankee xray whiskey victor"),
        (21, "r", "xray zulu whiskey yankee zulu"),
        (22, "r", "victor whiskey zulu xray yankee"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    out = importance_resample_dsir(
        df, is_target=F.col("grp") == "t", n_keep=6
    ).collect()
    assert {r["doc_id"] for r in out[:3]} == {10, 11, 12}
    w = {r["doc_id"]: r["logw_micro"] for r in out}
    # every target-vocab raw doc outranks every disjoint-vocab one
    assert min(w[10], w[11], w[12]) > max(w[20], w[21], w[22])
    ws = [r["logw_micro"] for r in out]
    assert ws == sorted(ws, reverse=True)


@pytest.mark.slow  # >15s: excluded from the default gate run
def test_dsir_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.operators.sampling import importance_resample_dsir

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = importance_resample_dsir(
        docs, is_target=F.col("source") == "src0", n_keep=20
    ).collect()
    re = importance_resample_dsir(
        docs.repartition(13, "doc_id"), is_target=F.col("source") == "src0", n_keep=20
    ).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in re]


def test_mixture_temperature_flattens_toward_small_sources(spark):
    from nypd_arrest_etl_spark.operators.sampling import mixture_temperature_weights

    rows = [(f"d{i}", "big", "w " * 100) for i in range(10)] + [
        ("s1", "small", "w " * 10)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    flat = {
        r["source"]: r
        for r in mixture_temperature_weights(df, alpha=0.3).collect()
    }
    prop = {
        r["source"]: r
        for r in mixture_temperature_weights(df, alpha=1.0).collect()
    }
    # alpha=1 is proportional: big has 1000 of 1010 tokens
    assert abs(prop["big"]["weight"] - 1000 / 1010) < 1e-6
    # alpha<1 upweights the small source vs proportional
    assert flat["small"]["weight"] > prop["small"]["weight"]
    # weights sum to ~1 and allocations to ~budget
    assert abs(sum(r["weight"] for r in flat.values()) - 1.0) < 1e-5
    assert abs(sum(r["alloc_tokens"] for r in flat.values()) - 1_000_000) <= 2
    # epochs = allocation over corpus size
    small = flat["small"]
    assert small["epochs"] == round(small["alloc_tokens"] / small["n_tokens"], 6)
