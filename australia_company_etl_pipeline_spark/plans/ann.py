"""Similarity-search queries over `embeddings` (training-data extensions).

Brute-force cosine top-k is the oracle-checked exact baseline; LSH and IVF
are the approximate scale paths (engine-specific hashing / plan shape →
rows-only driver check, with recall pinned against brute force in
tests/test_ann.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators import ann
from .registry import register

N_QUERIES = 5
K = 10


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings corpus, spread when the scan arrives under-split (one
    parquet file → one split): cosine math is per-row CPU that would
    otherwise serialize on a single task."""
    from ..session import ensure_min_partitions

    return ensure_min_partitions(table(spark, sf_dir, "embeddings"))


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic query set: the N lowest-id corpus vectors."""
    e = table(spark, sf_dir, "embeddings")
    return (e.filter(F.col("vec_id") < N_QUERIES)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec")))


@register(
    "ann_bruteforce_topk",
    doc="Exact cosine top-10 per query (queries = 5 lowest-id vectors, "
        "self-match included) — native zip_with/aggregate dot product, "
        "broadcast query side, window top-k.",
    tags=("ann",),
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6)
           AS cosine_sim
  FROM embeddings e CROSS JOIN q
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine_sim, rank FROM ranked WHERE rank <= {K}
""",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    return ann.brute_force_topk(corpus, _queries_df(spark, sf_dir), k=K)


@register(
    "ann_approx_topk",
    doc="Both approximate-NN scale paths in one result (fold of r2's "
        "ann_lsh_topk / ann_ivf_topk to fit the driver's query window): "
        "method='lsh' rows are LSH-bucketed top-10 (4 random hyperplanes, "
        "sign-bit buckets + hamming-1 multi-probe, equi-join on bucket); "
        "method='ivf' rows are IVF-Flat top-10 (deterministic Lloyd's "
        "k-means centroids — 16, 5 iterations, seeded hash-sample init — "
        "4-probe). Rows-only driver check; recall vs ann_bruteforce_topk "
        "pinned per method in tests/test_dedup_ann.py.",
    tags=("ann",),
    oracle=None,
)
def ann_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    q = _queries_df(spark, sf_dir)
    lsh = (ann.lsh_topk(corpus, q, k=K, n_planes=4, dim=64, multiprobe=1)
           .select(F.lit("lsh").alias("method"), "query_id", "vec_id",
                   "cosine_sim", "rank"))
    ivf = (ann.ivf_topk(corpus, q, k=K, n_centroids=16, n_probe=4)
           .select(F.lit("ivf").alias("method"), "query_id", "vec_id",
                   "cosine_sim", "rank"))
    return lsh.unionByName(ivf)
