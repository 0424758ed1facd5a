"""r10 probe 3: full ngram simhash branch with the fingerprint table
persisted before the band self-join (vs status quo ~10.4s)."""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from australia_company_etl_pipeline_spark.operators import dedup as dd  # noqa: E402
from australia_company_etl_pipeline_spark.plans.dedup import _docs_with_dups  # noqa: E402
from australia_company_etl_pipeline_spark.session import get_spark  # noqa: E402

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 4


def branch_fixed(spark):
    corpus = _docs_with_dups(spark, SF_DIR)
    sh = dd.shingle_frame(corpus, "text", "doc_id", shingle=3)
    fp = dd.simhash_table(corpus, "text", "doc_id", hash_fn="portable")
    fp = dd.persist_tracked(fp)
    pairs = dd.banded_hamming_pairs(fp, "doc_id", "__sh",
                                    max_hamming=8, n_bands=4)
    return (pairs
            .join(sh.select(F.col("doc_id").alias("id_a"),
                            F.col("__sh").alias("__na")), "id_a")
            .join(sh.select(F.col("doc_id").alias("id_b"),
                            F.col("__sh").alias("__nb")), "id_b")
            .select(F.lit("simhash").alias("method"), "id_a", "id_b",
                    F.round(dd.jaccard_arrays(F.col("__na"),
                                              F.col("__nb")), 6)
                    .alias("jaccard")))


def branch_fixed_no_shingle_reuse(spark):
    """fp persisted; verify frame rebuilt (as today) — isolates the
    persist-fp win from the shingle-reuse question."""
    corpus = _docs_with_dups(spark, SF_DIR)
    ng = corpus.select(F.col("doc_id"),
                       dd.word_ngrams(F.col("text"), 3).alias("__ng"))
    fp = dd.simhash_table(corpus, "text", "doc_id", hash_fn="portable")
    fp = dd.persist_tracked(fp)
    pairs = dd.banded_hamming_pairs(fp, "doc_id", "__sh",
                                    max_hamming=8, n_bands=4)
    return (pairs
            .join(ng.select(F.col("doc_id").alias("id_a"),
                            F.col("__ng").alias("__na")), "id_a")
            .join(ng.select(F.col("doc_id").alias("id_b"),
                            F.col("__ng").alias("__nb")), "id_b")
            .select(F.lit("simhash").alias("method"), "id_a", "id_b",
                    F.round(dd.jaccard_arrays(F.col("__na"),
                                              F.col("__nb")), 6)
                    .alias("jaccard")))


def main():
    spark = get_spark("r10-simhash-fix")
    spark.sparkContext.setLogLevel("ERROR")
    cases = {"fp_persist+sh_reuse": branch_fixed,
             "fp_persist_only": branch_fixed_no_shingle_reuse}
    counts = {}
    for name, fn in cases.items():
        counts[name] = fn(spark).count()
        dd.unpersist_shingles()
    print("counts:", counts)
    assert counts["fp_persist+sh_reuse"] == counts["fp_persist_only"] == 73081, counts
    times = {n: [] for n in cases}
    for _ in range(REPS):
        for name, fn in cases.items():
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark).write.mode("overwrite").format("noop").save()
            times[name].append(time.perf_counter() - t0)
            dd.unpersist_shingles()
    for name, ts in times.items():
        print(name, [round(t, 2) for t in ts],
              "median", round(statistics.median(ts), 2))
    spark.stop()


if __name__ == "__main__":
    main()
