"""r10 probe 2: where does the ngram simhash branch spend its ~10s?
Times, at sf0.1: (a) simhash_table portable (FNV char-fold), (b)
simhash_table native (xxhash64), (c) an md5-based portable candidate,
(d) banded_hamming_pairs over a precomputed fingerprint table."""
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
REPS = 3


def md5_simhash_table(df, text_col, id_col, bits=64):
    toks = df.select(F.col(id_col),
                     F.explode_outer(dd.tokens(F.col(text_col)))
                     .alias("__t"))
    hx = F.md5(F.col("__t"))
    hashed = toks.select(
        F.col(id_col),
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long").alias("__h1"),
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("long").alias("__h2"))
    bit = {i: (F.shiftright("__h1", i).bitwiseAND(F.lit(1))
               if i < 32 else
               F.shiftright("__h2", i - 32).bitwiseAND(F.lit(1)))
           for i in range(bits)}
    votes = hashed.groupBy(id_col).agg(*[
        F.sum(bit[i].cast("int") * 2 - 1).alias(f"__v{i}")
        for i in range(bits)
    ])
    fp = F.lit(0).cast("long")
    for i in range(bits):
        power = (1 << i) - ((1 << 64) if i == bits - 1 and bits == 64 else 0)
        fp = fp.bitwiseOR(
            F.when(F.col(f"__v{i}") > 0, F.lit(power).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return votes.select(F.col(id_col), fp.alias("__sh"))


def main():
    spark = get_spark("r10-simhash-profile")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = _docs_with_dups(spark, SF_DIR)

    fp_cached = dd.simhash_table(corpus, "text", "doc_id",
                                 hash_fn="portable").persist()
    fp_cached.count()

    cases = {
        "fp_portable_fnv": lambda: dd.simhash_table(
            corpus, "text", "doc_id", hash_fn="portable"),
        "fp_native_xx": lambda: dd.simhash_table(
            corpus, "text", "doc_id", hash_fn="native"),
        "fp_md5_portable": lambda: md5_simhash_table(
            corpus, "text", "doc_id"),
        "banded_pairs_only": lambda: dd.banded_hamming_pairs(
            fp_cached, "doc_id", "__sh", max_hamming=8, n_bands=4),
    }
    for name, fn in cases.items():
        fn().write.mode("overwrite").format("noop").save()  # warm
    times = {n: [] for n in cases}
    for _ in range(REPS):
        for name, fn in cases.items():
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(name, [round(t, 2) for t in ts],
              "median", round(statistics.median(ts), 2))
    spark.stop()


if __name__ == "__main__":
    main()
