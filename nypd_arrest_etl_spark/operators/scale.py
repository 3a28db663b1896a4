"""Scale-hardening operators: the explicit tools for the 100 TB path
(SURVEY.md §7 M6) that go beyond what AQE applies automatically.

Three situations where Catalyst/AQE alone is not enough at scale:

- **Skewed join keys** (``salted_join``): AQE's skew-join splitting
  only fires for sort-merge joins after a shuffle has already produced
  oversized partitions, and cannot split a skewed *broadcast-probe* or
  pre-shuffle hot key. Salting rewrites the join so the hot key's rows
  are spread over N synthetic sub-keys before the shuffle happens —
  the classic fix for the reference's own default-value hot keys
  ('UNKNOWN', -1) created by its null-fill step
  (/root/reference/scripts/transform.py:129-146, SURVEY §4).

- **Repeated co-located joins** (``write_bucketed``): two tables
  bucketed by the same key into the same bucket count join with ZERO
  shuffle — each task reads matching bucket files from both sides. At
  100 TB a fact-table shuffle is the single largest cost in the plan;
  bucketing pays it once at write time and amortizes it over every
  subsequent join/aggregation on that key.

- **Cross-stage semi-join pruning** (``bloom_prune``): Spark's runtime
  row-group/bloom pruning (``spark.sql.optimizer.runtime.bloomFilter``)
  only injects within a single query. When the "dim side" is computed
  in a different pipeline stage (or a different job entirely), an
  explicit bloom filter built with ``bloom_filter_agg`` and shipped to
  the probe side as a literal prunes the fact scan *before* the join
  shuffle, with zero false negatives (join result provably unchanged).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over
    ``salt_buckets`` sub-keys.

    The skewed side gets a deterministic-per-row salt (hash of a
    monotonic row id — the salt *value* never affects the result, only
    the shuffle placement); the other side is exploded x``salt_buckets``
    so every (key, salt) pair still meets its matches. The join keys
    become ``on + [__salt]``, so one hot key hashes to ``salt_buckets``
    shuffle partitions instead of one straggler.

    Cost model: the non-skewed side is duplicated N times through the
    shuffle — use this when the skewed side's hot key dwarfs
    ``len(other) * salt_buckets`` (else plain AQE skew-split or a
    broadcast is cheaper). Supports inner/left joins (the salted side
    must be the left/row-preserving side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return left.join(right, on + ["__salt"], how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) by ``key``.

    Joins and aggregations between tables bucketed by the same key into
    the same ``num_buckets`` plan with no Exchange on either side; with
    ``sort=True`` the sort-merge join also skips its per-task sort.
    ``num_buckets`` sizes a bucket file to fit one task comfortably —
    at 100 TB pick buckets so each is O(100-500 MB) compressed.
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def _bloom_hashes(key: str) -> list[F.Column]:
    """Two independent 64-bit hashes of ``key``, computed JVM-side with
    ``xxhash64`` so build and probe agree bit-for-bit (double hashing:
    position_i = h1 + i*h2 gives k derived hash functions)."""
    return [
        F.xxhash64(F.col(key)).alias("__h1"),
        F.xxhash64(F.col(key), F.lit(0x9E3779B9)).alias("__h2"),
    ]


def _positions(h1, h2, k: int, num_bits: int):
    import numpy as np

    a = h1.to_numpy(dtype="int64").astype("uint64")
    b = h2.to_numpy(dtype="int64").astype("uint64")
    for i in range(k):
        yield ((a + np.uint64(i) * b) % np.uint64(num_bits)).astype("int64")


def build_bloom(
    dim: DataFrame, dim_key: str, expected_items: int = 1_000_000, num_bits: int = 8_388_608
) -> tuple[bytes, int]:
    """Aggregate ``dim[dim_key]`` into a bloom bitmap: each partition
    builds a local ``num_bits``-bit numpy bitmap (a mergeable partial
    aggregate — the map-side combine shape), the driver ORs the
    per-partition bitmaps. Driver traffic is O(partitions x bits/8),
    never O(rows). Returns (bitmap bytes, k hash functions)."""
    import math

    import numpy as np

    k = max(1, min(8, round(num_bits / max(1, expected_items) * math.log(2))))
    nb = num_bits

    def _partial(batches):
        import numpy as np

        bits = np.zeros(nb // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if len(pdf):
                seen = True
                for pos in _positions(pdf["__h1"], pdf["__h2"], k, nb):
                    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype("uint8"))
        if seen:
            yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    partials = dim.select(*_bloom_hashes(dim_key)).mapInPandas(
        _partial, "bitmap binary"
    ).collect()
    merged = np.zeros(num_bits // 8, dtype=np.uint8)
    for row in partials:
        merged |= np.frombuffer(bytes(row["bitmap"]), dtype=np.uint8)
    return merged.tobytes(), k


def bloom_prune(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    expected_items: int = 1_000_000,
    num_bits: int = 8_388_608,
) -> DataFrame:
    """Filter ``fact`` to rows whose ``fact_key`` *might* appear in
    ``dim[dim_key]``, using a bloom filter aggregated over the dim side.

    No false negatives: ``fact.join(dim)`` on the keys returns exactly
    the same rows before and after pruning — the filter only discards
    fact rows that provably have no match, before they pay the join
    shuffle. The bitmap (1 MiB at the default) ships to every fact task
    once in the UDF closure; the probe is a vectorized Arrow-batched
    bit test over JVM-computed hashes. Same mechanics as Spark's
    injected runtime bloom filter
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) but usable
    across pipeline stages/jobs where the optimizer cannot see both
    sides in one plan.
    """
    from pyspark.sql.functions import pandas_udf

    dim_key = dim_key or fact_key
    bitmap, k = build_bloom(dim, dim_key, expected_items, num_bits)
    nb = num_bits

    @pandas_udf("boolean")
    def _might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        import numpy as np

        bits = np.frombuffer(bitmap, dtype=np.uint8)
        ok = np.ones(len(h1), dtype=bool)
        for pos in _positions(h1, h2, k, nb):
            ok &= (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype("uint8"))) != 0
        return pd.Series(ok)

    h1, h2 = _bloom_hashes(fact_key)
    return (
        fact.withColumns({"__h1": h1, "__h2": h2})
        .filter(_might_contain("__h1", "__h2"))
        .drop("__h1", "__h2")
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 256,
    salt: int = 0,
    est_col: str = "kmv_est",
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group (Bar-Yossef et
    al. 2002): hash every key uniformly into [0, 2^32), keep the K
    smallest distinct hash values, estimate |distinct| as
    (K-1) * 2^32 / h_(K). Groups with fewer than K distinct hashes
    report the exact count (the sketch isn't full — standard KMV).

    Why this next to HLL (``approx_count_distinct``): the sketch state
    is just "K smallest values" — mergeable (union = keep K smallest
    of the union), fixed-size, AND engine-portable. Built on the
    portable Knuth hash, the estimate itself is bit-for-bit
    reproducible in any SQL engine, so an external oracle can verify
    it — HLL's register encoding is engine-internal and cannot be.

    Plan: distinct on (group, hash) [1 shuffle, map-side partial
    distinct], then rank-within-group; Catalyst rewrites the
    ``row_number() <= K`` filter into WindowGroupLimit, so each map
    task forwards at most K rows per group into the final per-group
    top-K — the shuffle after distinct moves O(groups * K), not the
    key stream. Estimator arithmetic is exact-integer + one double
    division, identical across engines.
    """
    from pyspark.sql import Window

    from nypd_arrest_etl_spark.operators.sampling import _portable_hash

    # NULL keys are ignored, matching countDistinct semantics. Without
    # this filter the NULL hash (itself NULL) would sort NULLS-FIRST into
    # rank 1, shifting every real hash down one rank and biasing the
    # estimate — and SQL engines that rank NULLS LAST would disagree.
    h = _portable_hash(F.col(key_col), salt)
    dh = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, h.alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("__h")
    ranked = dh.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k)
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("__m"),
            F.max(F.when(F.col("__rk") == k, F.col("__h"))).alias("__kth"),
        )
        .select(
            *group_cols,
            F.when(F.col("__m") < k, F.col("__m").cast("double"))
            .otherwise(
                F.round(F.lit(float(k - 1) * 4294967296.0) / F.col("__kth"), 2)
            )
            .alias(est_col),
        )
    )


def distribute_by(df: DataFrame, *cols: str | Column, n: int | None = None) -> DataFrame:
    """Explicit repartition-by-key (DISTRIBUTE BY): pay one shuffle now
    so several downstream ops on the same key (window + agg + join)
    reuse the partitioning instead of each shuffling independently."""
    return df.repartition(n, *cols) if n else df.repartition(*cols)


__all__ = ["salted_join", "write_bucketed", "bloom_prune", "kmv_distinct", "distribute_by"]


# ---------------------------------------------------------------------------
# Physical layout management: Z-order + compaction
# ---------------------------------------------------------------------------


def zorder_key(
    df: DataFrame, cols: list[str], bits_per_col: int = 8
) -> tuple[DataFrame, str]:
    """Append an interleaved Z-order key column for multi-dimensional
    data skipping (the mechanism behind Delta's OPTIMIZE ZORDER BY,
    built from public primitives).

    Each column is bucketized into 2^bits quantile buckets via
    ``approxQuantile`` (driver-side, sample-based — one cheap pass),
    then the bucket bits are interleaved so files sorted by the key
    are simultaneously clustered on EVERY listed column. Parquet
    min/max row-group stats on any of the columns then skip most
    files for point/range predicates — single-column sorting only
    buys skipping on the leading column.
    """
    nb = 1 << bits_per_col
    bcols = []
    for c in cols:
        qs = df.stat.approxQuantile(c, [i / nb for i in range(1, nb)], 0.01)
        # strictly-increasing boundary list (duplicate quantiles on
        # low-cardinality columns collapse to fewer buckets)
        bounds = sorted(set(qs))
        expr = F.lit(0)
        for i, b in enumerate(bounds):
            expr = F.when(F.col(c) > F.lit(b), i + 1).otherwise(expr)
        bcols.append(expr)
    interleaved = F.lit(0).cast("long")
    for bit in range(bits_per_col - 1, -1, -1):
        for bc in bcols:
            interleaved = (
                interleaved.cast("long") * 2
                + F.shiftrightunsigned(bc.cast("long"), bit).bitwiseAND(F.lit(1))
            )
    return df.withColumn("_zkey", interleaved), "_zkey"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits_per_col: int = 8,
) -> None:
    """Write parquet laid out in Z-order over ``cols``: range-partition
    by the interleaved key (one shuffle) then sort within partitions,
    so each output file covers a tight hyper-rectangle of the listed
    columns and parquet footer stats prune it for predicates on ANY of
    them."""
    keyed, zk = zorder_key(df, cols, bits_per_col)
    (
        keyed.repartitionByRange(n_files, F.col(zk))
        .sortWithinPartitions(zk)
        .drop(zk)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_files(
    spark, src_path: str, dst_path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> tuple[int, int]:
    """Rewrite a parquet directory into ~target-sized files (the
    small-files problem: a 100 TB table ingested incrementally ends up
    with millions of tiny files whose open/footer costs dominate
    scans). Sizes come from the Hadoop FileSystem API, so the same
    code runs against HDFS/S3A/local. Returns (files_before,
    files_after). Plain coalesce — no shuffle: each output file
    concatenates whole input files."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    total, n_before = 0, 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet"):
            total += f.getLen()
            n_before += 1
    n_after = max(1, -(-total // target_file_bytes))
    spark.read.parquet(src_path).coalesce(n_after).write.mode("overwrite").parquet(
        dst_path
    )
    return n_before, n_after


def kmv_overlap(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 128,
    hash_expr: Column | None = None,
) -> DataFrame:
    """Pairwise distinct-set overlap between groups from KMV sketches:
    estimated |A∪B|, |A∩B| and Jaccard for every unordered group pair,
    WITHOUT an exact pairwise distinct (which would re-shuffle the raw
    key stream once per pair).

    Estimator (Beyer et al. 2007, "On synopses for distinct-value
    estimation"): take the k smallest distinct hash values of A∪B
    (= merge of the two per-group sketches); |A∪B| ≈ (k-1)·2^32/h_(k);
    Jaccard ≈ |{h in that window seen in BOTH sketches}| / k;
    |A∩B| = Jaccard · |A∪B|. When the merged sketch isn't full the
    values are exact (modulo hash collisions), not estimates.

    Like ``kmv_distinct`` the hash is the engine-portable md5-derived
    60-bit value folded into [0, 2^32), so a SQL oracle replays every
    estimate bit-for-bit — this is the sketch whose STATE is portable,
    next to the faster but engine-internal native HLL.

    Plan: ONE distinct shuffle over (group, hash) — the only pass over
    the raw data — then per-group top-k (WindowGroupLimit: each map
    task forwards ≤ k rows per group), then the tiny O(G·k) sketch
    table fans out to its G-1 partners. The pairwise stage costs
    O(G²·k) rows independent of data volume: meant for mixture-level
    audits (G = sources/shards, up to a few thousand), not for
    per-document pairing — that's MinHash-LSH's job (dedup.py).
    """
    from pyspark.sql import Window

    from nypd_arrest_etl_spark.operators.dedup import portable_str_hash60

    h = (
        hash_expr
        if hash_expr is not None
        else F.pmod(portable_str_hash60(F.col(key_col).cast("string")), F.lit(4294967296))
    )
    sk0 = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(group_col).alias("g"), h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("h")
    skk = (
        sk0.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("g", "h")
    )
    gs = skk.select("g").distinct()
    tagged = (
        skk.alias("s")
        .join(F.broadcast(gs.alias("p")), F.col("s.g") != F.col("p.g"))
        .select(
            F.least(F.col("s.g"), F.col("p.g")).alias("ga"),
            F.greatest(F.col("s.g"), F.col("p.g")).alias("gb"),
            F.col("s.g").alias("src_g"),
            F.col("s.h").alias("h"),
        )
    )
    per_hash = tagged.groupBy("ga", "gb", "h").agg(
        F.countDistinct("src_g").alias("nsrc")
    )
    wp = Window.partitionBy("ga", "gb").orderBy("h")
    ranked = per_hash.withColumn("rk", F.row_number().over(wp)).filter(
        F.col("rk") <= k
    )
    agg = ranked.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("m"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("kth"),
        F.sum(F.when(F.col("nsrc") == 2, 1).otherwise(0)).alias("ik"),
    )
    union_raw = F.when(F.col("m") < k, F.col("m").cast("double")).otherwise(
        F.lit(float(k - 1) * 4294967296.0) / F.col("kth")
    )
    jac_raw = F.col("ik") / F.col("m").cast("double")
    return agg.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        F.when(F.col("m") < k, F.col("m").cast("double"))
        .otherwise(F.round(F.lit(float(k - 1) * 4294967296.0) / F.col("kth"), 2))
        .alias("union_est"),
        F.round(jac_raw, 6).alias("jaccard_est"),
        F.round(jac_raw * union_raw, 2).alias("inter_est"),
    )
