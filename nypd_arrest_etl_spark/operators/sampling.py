"""Deterministic sampling + one-pass profiling for training-data mixes.

Sampling in a 100 TB pipeline must be REPRODUCIBLE (reruns and
backfills pick the same rows — ``df.sample`` does not guarantee this
across partitionings) and PUSHABLE (a pure column predicate, so it
prunes before shuffles/joins). Hash-of-key sampling gives both:
keep iff hash(key, salt) mod D < fraction * D. Changing the salt
draws an independent sample; the same salt is a consistent sample
across tables sharing the key (join-compatible sampling).

The reference has no sampling surface (SURVEY.md §2d: the category is
an ABSENT — planned extension); this is the standard mechanism used
for training-data mixture construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = 1_000_000

# Knuth multiplicative hash constants: portable to any engine with
# 64-bit integer arithmetic (used by the declared-query oracle, which
# DuckDB must replay bit-for-bit; xxhash64 is Spark-only).
_KNUTH = 2654435761
_MASK32 = 4294967296


def _portable_hash(key: Column, salt: int) -> Column:
    """The Knuth multiplicative hash — the ONE definition both the
    operators and their DuckDB oracles must agree on bit-for-bit."""
    return F.pmod((key.cast("long") + F.lit(salt)) * F.lit(_KNUTH), F.lit(_MASK32))


def keep_hash(key: Column, salt: int = 0, portable: bool = False) -> Column:
    """Uniform [0, _DENOM) bucket for a row key.

    Default is xxhash64 (JVM, fast, good diffusion). ``portable=True``
    switches to the Knuth multiplicative hash over integer keys that
    any SQL engine reproduces exactly — used by the oracle-checked
    query.
    """
    h = _portable_hash(key, salt) if portable else F.xxhash64(key, F.lit(salt))
    return F.pmod(h, F.lit(_DENOM))


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Deterministic ``fraction`` sample by key hash. A pure filter:
    Catalyst pushes it to the scan, so downstream joins/aggs see only
    the sample."""
    return df.filter(
        keep_hash(F.col(key_col), salt, portable) < int(fraction * _DENOM)
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Per-stratum deterministic sampling (training-data mixture
    construction: e.g. keep 50% of 'en', 5% of everything else).

    One CASE expression per stratum — no per-stratum scans, no
    ``sampleBy`` RNG. Still a pure filter; with the stratum column in
    the partition layout the zero-fraction strata prune entirely."""
    cut = F.lit(int(default_fraction * _DENOM))
    for value, frac in fractions.items():
        cut = F.when(F.col(stratum_col) == value, int(frac * _DENOM)).otherwise(cut)
    return df.filter(keep_hash(F.col(key_col), salt, portable) < cut)


def fixed_size_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    m: int,
    salt: int = 0,
    portable: bool = False,
) -> DataFrame:
    """EXACTLY min(m, |group|) rows per group, deterministically.

    Fraction sampling (``hash_sample``) cannot hit a fixed budget per
    source; training mixes are usually specified as "N docs from each
    source". Rank rows inside each group by hash(key, salt) — an
    unbiased, reproducible order uncorrelated with any natural key —
    and keep the first m. Tie-break on the key itself so the cut is
    total even under hash collisions.

    Plan: one shuffle on ``group_col`` + sort, and Catalyst rewrites
    rank<=m into WindowGroupLimit (per-partition top-m pushed BEFORE
    the shuffle), so the exchange moves at most m rows per group per
    input partition, not the whole corpus. Skewed giant groups
    therefore cost map-side heap maintenance, not a hot reducer.
    """
    h = (
        _portable_hash(F.col(key_col), salt)
        if portable
        else F.xxhash64(F.col(key_col), F.lit(salt))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= m)
        .drop("_rk")
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass per-column profile: (column_name, n_rows, n_nulls,
    n_distinct).

    A single ungrouped Aggregate computes every stat — partial aggs
    combine map-side, the final reduce sees one row per partition, and
    the per-column pivot happens on the 1-row result via ``stack``
    (driver-sized). Multiple exact COUNT(DISTINCT)s plan as one Expand
    — still a single scan of the table, the property that matters at
    100 TB. For wide tables swap `approx_count_distinct` in (same
    shape, no Expand)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    one = df.agg(*aggs)
    parts = ", ".join(f"'{c}', n_rows, nn_{c}, nd_{c}" for c in cols)
    return one.select(
        F.expr(
            f"stack({len(cols)}, {parts}) AS (column_name, n_rows, n_nulls, n_distinct)"
        )
    )


def shuffle_deterministic(
    df: DataFrame,
    key_col: str,
    seed: int = 0,
    portable: bool = False,
    pos_col: str | None = None,
) -> DataFrame:
    """Seeded global shuffle for training-order randomization: sort by
    hash(key, seed) — the same seed reproduces the same order on any
    cluster size (epoch N+1 = new seed, no state to carry).

    At scale this plans as a range-partitioned sort (sampling pass +
    one shuffle), and the hash order is uncorrelated with source order
    or any natural key, which is exactly what SGD wants. The hash
    tie-breaks on the key itself so the order is total even under hash
    collisions. ``portable=True`` uses the Knuth hash the DuckDB
    oracle replays bit-for-bit.
    """
    h = (
        _portable_hash(F.col(key_col), seed)
        if portable
        else F.xxhash64(F.col(key_col), F.lit(seed))
    )
    out = df.withColumn(pos_col or "shuffle_pos", h).orderBy(
        pos_col or "shuffle_pos", key_col
    )
    return out if pos_col else out.drop("shuffle_pos")


def check_constraints(df: DataFrame, rules: dict[str, "F.Column"]) -> DataFrame:
    """Declarative data-quality audit: each rule is a BOOLEAN column
    expression that should hold per row; the report is one row per
    rule with violation counts and rates — the pre/post gate a
    pipeline runs around every transformation (the engine-native form
    of the reference's scattered validations, SURVEY S5/T3/T11).

    All rules evaluate in ONE scan (conditional aggregation — no
    per-rule jobs, no shuffle beyond the single global agg); null rule
    results count as violations (three-valued logic made explicit).
    """
    aggs = []
    for name, cond in rules.items():
        viol = F.sum(F.when(cond.isNull() | ~cond, 1).otherwise(0))
        aggs.append(viol.alias(name))
    total = df.agg(F.count(F.lit(1)).alias("__n"), *aggs).first()
    n = total["__n"]
    spark = df.sparkSession
    rows = [
        (name, n, int(total[name]), round(int(total[name]) / n, 6) if n else 0.0)
        for name in rules
    ]
    return spark.createDataFrame(
        rows, "rule string, n_rows long, n_violations long, violation_rate double"
    )


def histogram(
    df: DataFrame, col: str, bins: int = 10
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bin, lo, hi, n_rows).

    Two aggregations total, independent of bin count: a 1-row min/max
    agg (broadcast back as a literal-free cross join — one row, zero
    shuffle weight) and one groupBy on the computed bin index. Nulls
    are excluded; the max value lands in the last bin (right edge
    inclusive there, standard histogram convention). Bins with zero
    rows are emitted (the report is the full bin spine, join-filled),
    so downstream plotting/drift checks see a fixed-shape result.
    """
    spark = df.sparkSession
    vals = df.select(F.col(col).cast("double").alias("x")).filter(
        F.col("x").isNotNull()
    )
    rng = vals.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    # bin = floor((x - lo) / width), clamped so x == hi joins the last bin
    binned = vals.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.lit(bins - 1),
            F.when(
                F.col("hi") > F.col("lo"),
                F.floor((F.col("x") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / bins)),
            ).otherwise(F.lit(0)),
        )
        .cast("int")
        .alias("bin")
    )
    counts = binned.groupBy("bin").agg(F.count("*").alias("n_rows"))
    spine = (
        spark.range(bins)
        .select(F.col("id").cast("int").alias("bin"))
        .crossJoin(F.broadcast(rng))
        .select(
            "bin",
            F.round(F.col("lo") + F.col("bin") * (F.col("hi") - F.col("lo")) / bins, 6).alias("lo"),
            F.round(F.col("lo") + (F.col("bin") + 1) * (F.col("hi") - F.col("lo")) / bins, 6).alias("hi"),
        )
    )
    return (
        spine.join(counts, "bin", "left")
        .select(
            "bin", "lo", "hi", F.coalesce("n_rows", F.lit(0)).cast("long").alias("n_rows")
        )
        .orderBy("bin")
    )


def oversample_mixture(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Epoch-style mixture weighting with weights ABOVE 1: each row is
    emitted floor(w) times plus one more with probability frac(w),
    decided by the same deterministic key hash as the down-sampling
    ops (a weight of 2.5 emits every row twice and half the rows —
    hash-chosen, reproducible — a third time). Weights below 1 degrade
    to plain hash sampling. Output adds ``copy_idx`` (0-based) so
    downstream shuffles can separate the copies.

    This is how training mixes express "3 epochs of Wikipedia, 0.4 of
    CommonCrawl" without materializing per-epoch unions: ONE narrow
    pass, no join, no shuffle; the explode fan-out is bounded by the
    weight table. At 100 TB the copies never co-locate (downstream
    training-order shuffle scatters them), and determinism means a
    backfill reproduces the exact mix.

    The per-stratum floor and fractional-copy threshold are computed
    in PYTHON as integers and injected as literals: float expressions
    like ``(w - floor(w)) * 1e6`` truncate/round differently across
    engines (0.7 -> 699999.999..., one hash bucket apart), so both
    this operator and any SQL oracle must share the single
    ``int(round(frac * _DENOM))`` value.
    """
    import math

    def _parts(w: float) -> tuple[int, int]:
        fl = math.floor(float(w))
        return int(fl), int(round((float(w) - fl) * _DENOM))

    d_fl, d_th = _parts(default_weight)
    floor_expr, thr_expr = F.lit(d_fl), F.lit(d_th)
    for value, w in weights.items():
        fl, th = _parts(w)
        floor_expr = F.when(F.col(stratum_col) == value, fl).otherwise(floor_expr)
        thr_expr = F.when(F.col(stratum_col) == value, th).otherwise(thr_expr)
    h = keep_hash(F.col(key_col), salt, portable)
    n_copies = floor_expr.cast("int") + (h < thr_expr.cast("long")).cast("int")
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


def drift_report(
    ref: DataFrame, cur: DataFrame, col: str, eps: float = 1e-6
) -> DataFrame:
    """Categorical drift between two dataset snapshots: per-category
    share in each snapshot plus the PSI contribution
    ``(p_cur - p_ref) * ln(p_cur / p_ref)`` (population stability
    index — the standard monitoring metric; sum the column for total
    PSI; > 0.2 conventionally flags a shifted mixture).

    Shape: one tiny aggregation per snapshot (category-cardinality
    sized after map-side partial aggs), a full outer join so
    categories appearing in only one snapshot still report, and
    ``eps`` smoothing so those one-sided categories contribute a
    finite penalty instead of log-of-zero. Two corpus scans total —
    nothing about the corpus itself is shuffled.
    """
    def shares(df: DataFrame, side: str) -> DataFrame:
        c = df.groupBy(F.col(col).alias("category")).agg(
            F.count("*").alias(f"n_{side}")
        )
        tot = c.agg(F.sum(f"n_{side}").alias("t"))
        return c.crossJoin(F.broadcast(tot)).select(
            "category",
            f"n_{side}",
            (F.col(f"n_{side}") / F.col("t")).alias(f"p_{side}"),
        )

    r, c = shares(ref, "ref"), shares(cur, "cur")
    p_ref = F.coalesce("p_ref", F.lit(0.0)) + eps
    p_cur = F.coalesce("p_cur", F.lit(0.0)) + eps
    return (
        r.join(c, "category", "full_outer")
        .select(
            "category",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
            F.round(F.coalesce("p_ref", F.lit(0.0)), 6).alias("p_ref"),
            F.round(F.coalesce("p_cur", F.lit(0.0)), 6).alias("p_cur"),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi"),
        )
        .orderBy("category")
    )


def importance_resample_dsir(
    df: DataFrame,
    is_target: Column,
    n_keep: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    unpersist_into: list | None = None,
) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.
    2023): pick the raw-corpus documents whose hashed-unigram
    distribution looks most like a small target domain.

    Rows where ``is_target`` holds define the target distribution;
    every other row is the raw pool being scored. Token features are
    hashed into ``n_buckets`` buckets (the paper's hashed n-gram
    trick: the model is O(n_buckets), not O(vocab)); per-bucket
    add-one-smoothed probabilities under target and raw give a
    per-token log importance ratio; a document's weight is the sum
    over its tokens. Output: the ``n_keep`` raw docs with the highest
    weight — (doc_id, n_toks, logw_micro), ordered (weight DESC,
    doc_id) so the kept set is engine-exact.

    Engine-exactness: per-bucket log-ratios are rounded to integer
    MICRO-units (``round(ln(r) * 1e6)`` as BIGINT) before the per-doc
    sum, so the sum is integer arithmetic — independent of Spark's
    partition-order float accumulation, and bit-replayable by the
    DuckDB oracle. The only float op is ``ln`` of a ratio of exact
    rationals; a libm ulp flips the micro-rounding only on an exact
    .5 boundary (measure-zero, same exposure BM25 accepts).

    Scale (100 TB): the token explode is aggregated to (doc, bucket,
    count) grain — at most min(n_toks, n_buckets) rows per doc — and
    everything downstream (bucket model, count-weighted scoring sum)
    works on that histogram, so shuffles move histograms, never raw
    tokens. The histogram is CACHED (r12): the model branch needs
    every row anyway (target + raw), so the scoring branch's
    NOT-target pushdown only ever saved re-tokenizing the raw pool —
    and the per-token md5 hashing is the dominant kernel, so one
    tokenize+hash pass with a filter over the cached histogram beats
    two scans with pushdown on either side of the measurement (A/B'd
    this round; the previous separate-scan posture is the right trade
    only when the target slice is large and tokenization is cheap).
    The model (n_buckets rows) broadcasts to the scoring join, so
    scoring is map-side over the histogram. Top-n is
    TakeOrderedAndProject.

    Cache lifecycle (r13, VERDICT r12 task 4): the histogram cache is
    operator-internal and the returned frame's lineage runs through
    it, so it cannot be freed before return. Pass ``unpersist_into``
    (any list) to receive a zero-arg handle that unpersists the
    histogram blocks; call it after fully consuming the result (the
    blocks are a lazy cache, so a later action simply recomputes —
    never wrong, same contract as ngram_lm_score's handle).
    """
    from nypd_arrest_etl_spark.operators.dedup import portable_str_hash60

    doc_hist = (
        df.select(
            F.col(id_col).alias("doc_id"),
            is_target.alias("is_t"),
            F.explode(
                F.filter(
                    F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
                )
            ).alias("tok"),
        )
        .select(
            "doc_id",
            "is_t",
            F.pmod(portable_str_hash60(F.lower("tok")), F.lit(n_buckets)).alias("b"),
        )
        .groupBy("doc_id", "is_t", "b")
        .agg(F.count("*").alias("cnt"))
    ).cache()
    if unpersist_into is not None:
        unpersist_into.append(lambda d=doc_hist: d.unpersist())
    model = doc_hist.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), F.col("cnt")).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_t"), F.col("cnt")).otherwise(0)).alias("cr"),
    )
    totals = model.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    contrib = model.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            F.log(
                ((F.col("ct") + 1.0) / (F.col("nt") + float(n_buckets)))
                / ((F.col("cr") + 1.0) / (F.col("nr") + float(n_buckets)))
            )
            * 1_000_000
        )
        .cast("long")
        .alias("w"),
    )
    return (
        doc_hist.filter(~F.col("is_t"))
        .join(F.broadcast(contrib), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_toks"),
            F.sum(F.col("w") * F.col("cnt")).alias("logw_micro"),
        )
        .orderBy(F.col("logw_micro").desc(), "doc_id")
        .limit(n_keep)
    )


def mixture_temperature_weights(
    df: DataFrame,
    alpha: float = 0.3,
    token_budget: int = 1_000_000,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual/multi-source
    sampling rule from T5/mT5: sample source i with p_i proportional to
    n_i^alpha, alpha < 1 upweighting small sources), plus the planning
    columns a training run wants: expected token allocation under a
    budget and the implied epoch count (allocation / corpus size —
    epochs > 1 flags sources the schedule will repeat).

    Engine-exactness: per-source token totals are integer sums; the
    alpha-power is integer-micro-ized (``round(n^alpha * 1e6)`` BIGINT)
    BEFORE the denominator sum, so the normalization is integer
    arithmetic — no float-accumulation order dependence — and weights /
    allocations round identically in any engine.

    Scale (100 TB): token counting is a narrow projection; ONE shuffle
    to O(sources) rows; the normalization joins a broadcast 1-row
    total. Nothing doc-grain ever moves again.
    """
    toks = F.size(
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")
    )
    per_src = (
        df.select(F.col(source_col).alias("source"), toks.alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("n_tokens"))
        .withColumn(
            "pow_micro",
            F.round(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) * 1_000_000)
            .cast("long"),
        )
    )
    total = per_src.agg(F.sum("pow_micro").alias("t"))
    return (
        per_src.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_tokens",
            F.round(F.col("pow_micro") / F.col("t"), 6).alias("weight"),
            F.round(F.lit(token_budget) * F.col("pow_micro") / F.col("t"))
            .cast("long")
            .alias("alloc_tokens"),
        )
        .withColumn(
            "epochs", F.round(F.col("alloc_tokens") / F.col("n_tokens"), 6)
        )
        .orderBy("source")
    )
