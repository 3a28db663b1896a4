"""Stage-level wall-time profile of one registry query: times each
named sub-plan of the dedup/text pipelines through the noop sink in a
fresh session, so the expensive stage is identified on the committed
protocol's session shape (fresh JVM, warmed pool) instead of guessed.

Usage: python tools/profile_stages.py <query> [sf_dir]
Currently knows: dedup_jaccard_pairs, dedup_keep_best,
dedup_minhash_pairs, dedup_simhash_pairs, dedup_neardup_clusters.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {label:32s} {time.perf_counter() - t0:7.3f}s", flush=True)


def main():
    name = sys.argv[1]
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark import get_spark
    from nypd_arrest_etl_spark.operators import dedup as D
    from nypd_arrest_etl_spark.session import load_tables

    spark = get_spark(app_name="profile-stages")
    tables = load_tables(spark, SF_DIR)
    for df in tables.values():
        df.count()

    def _warm(batches):
        import numpy  # noqa: F401

        yield from batches

    spark.range(10_000).repartition(64).mapInPandas(_warm, "id long").count()
    docs = tables["documents"]

    for rep in range(3):
        print(f"pass {rep}:")
        spark.catalog.clearCache()
        if name in ("dedup_jaccard_pairs", "dedup_keep_best", "dedup_neardup_clusters"):
            t("shingle_postings", D.hashed_shingle_postings(docs, n=4))
            postings = D.hashed_shingle_postings(docs, n=4)
            dfreq = postings.groupBy("sh").agg(F.count("*").alias("df"))
            t("dfreq", dfreq)
            ordered = (
                postings.join(dfreq, "sh")
                .groupBy("doc_id")
                .agg(F.array_sort(F.collect_list(F.struct("df", "sh"))).alias("o"))
            )
            t("ordered", ordered)
            t("jaccard_pairs (full)", D.jaccard_pairs(docs, threshold=0.8, n=4))
        if name == "dedup_minhash_pairs":
            sh = D.with_shingles(docs, n=4)
            t("with_shingles", sh)
            t("signatures", D.minhash_signatures(sh, 64))
            t("minhash_lsh_pairs (full)", D.minhash_lsh_pairs(docs, 0.8, n=4))
        if name == "dedup_simhash_pairs":
            t("signatures", D.simhash_signatures(docs, n=4))
            t("simhash_pairs (full)", D.simhash_pairs(docs, 3, n=4))
        if name == "dedup_keep_best":
            import __spark_entry__ as e

            t("keep_best (full)", e.queries()["dedup_keep_best"](spark, SF_DIR))
        if name == "dedup_neardup_clusters":
            import __spark_entry__ as e

            t("neardup (full)", e.queries()["dedup_neardup_clusters"](spark, SF_DIR))


if __name__ == "__main__":
    main()
