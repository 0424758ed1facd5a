"""r10 probe: standalone simhash-branch cost of ngram_jaccard_dup_pairs
under three staging variants, at $SPARK_GRAFT_SF_DIR (default sf0.1).

Variants:
  current  — ng verify frame rebuilt unpersisted (referenced twice),
             simhash_table re-tokenizes from corpus (status quo).
  reuse_sh — verify join reads the persisted shingle frame (shingle=3
             == word_ngrams(text,3)); simhash_table still re-tokenizes.
  token_tf — ONE staged token_frame feeds shingle_frame(tokens_df=) and
             simhash_table(tokens_df=); verify join reads shingles.

Interleaved reps with GC barriers (bench discipline)."""
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
REPS = int(os.environ.get("PROBE_REPS", "4"))


def verify_join(pairs, ng, sh_col="__ng"):
    return (pairs
            .join(ng.select(F.col("doc_id").alias("id_a"),
                            F.col(sh_col).alias("__na")), "id_a")
            .join(ng.select(F.col("doc_id").alias("id_b"),
                            F.col(sh_col).alias("__nb")), "id_b")
            .select(F.lit("simhash").alias("method"), "id_a", "id_b",
                    F.round(dd.jaccard_arrays(F.col("__na"),
                                              F.col("__nb")), 6)
                    .alias("jaccard")))


def v_current(spark):
    corpus = _docs_with_dups(spark, SF_DIR)
    ng = corpus.select(F.col("doc_id"),
                       dd.word_ngrams(F.col("text"), 3).alias("__ng"))
    pairs = dd.simhash_dup_pairs(corpus, "text", "doc_id", max_hamming=8,
                                 hash_fn="portable")
    return verify_join(pairs, ng)


def v_reuse_sh(spark):
    corpus = _docs_with_dups(spark, SF_DIR)
    sh = dd.shingle_frame(corpus, "text", "doc_id", shingle=3)
    pairs = dd.simhash_dup_pairs(corpus, "text", "doc_id", max_hamming=8,
                                 hash_fn="portable")
    return verify_join(pairs, sh, sh_col="__sh")


def v_token_tf(spark):
    corpus = _docs_with_dups(spark, SF_DIR)
    tf = dd.token_frame(corpus, "text", "doc_id")
    sh = dd.shingle_frame(corpus, "text", "doc_id", shingle=3,
                          tokens_df=tf)
    pairs = dd.simhash_dup_pairs(corpus, "text", "doc_id", max_hamming=8,
                                 hash_fn="portable", tokens_df=tf)
    return verify_join(pairs, sh, sh_col="__sh")


def main():
    spark = get_spark("r10-simhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"current": v_current, "reuse_sh": v_reuse_sh,
                "token_tf": v_token_tf}
    # warm-up + value check: all three must agree
    counts = {}
    for name, fn in variants.items():
        df = fn(spark)
        counts[name] = df.count()
        dd.unpersist_shingles()
    print("counts:", counts)
    assert len(set(counts.values())) == 1, counts
    times = {n: [] for n in variants}
    for _ in range(REPS):
        for name, fn in variants.items():
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
