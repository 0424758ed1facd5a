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


def _ivf_cache_path(sf_dir: str, n_centroids: int, kmeans_iter: int,
                    seed: int) -> str:
    """Deterministic per-(dataset, params) location for the persisted
    IVF index, keyed on the embeddings file's identity (realpath + size
    + mtime) so a testdata regen can never serve a stale index. The
    'train once, probe many' product shape: the first run of the query
    builds the index (one k-means + one partitioned write via
    ``build_ivf_index``'s atomic swap — a concurrent reader never sees
    a half-built index); every later run is pure partition-pruned
    probing. On a cluster this would be a curated warehouse path, not a
    temp dir."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(os.path.realpath(sf_dir), "embeddings.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|{n_centroids}"
        f"|{kmeans_iter}|{seed}".encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), "acep_ivf_cache", key)


@register(
    "ann_approx_topk",
    doc="The approximate / semantic vector-analytics paths in one "
        "kind-tagged result (fold to fit the driver's query window): "
        "method='lsh' rows are LSH-bucketed top-10 (4 random "
        "hyperplanes, sign-bit buckets + hamming<=2 multi-probe, "
        "equi-join on bucket); method='ivf' rows are IVF-Flat top-10 "
        "answered from the PERSISTED partition-pruned index "
        "(operators/ann.py build_ivf_index / ivf_index_topk — built "
        "once per dataset into a keyed cache dir, then every run is "
        "probe-only: hive partition pruning reads 4 of 16 inverted "
        "lists, k-means never retrains per query). method='semdedup' "
        "rows are the SemDeDup election over the planted near-dup "
        "embedding corpus (cluster -> within-cluster pairs -> connected "
        "components -> keep-farthest): query_id = member vec_id, "
        "vec_id = its duplicate-group id (min member), cosine_sim = "
        "cosine to the assigned centroid (NULL for quarantined "
        "vectors), rank = 1 for the elected canonical member else 0. "
        "Engine-specific hashing / iterative k-means -> rows-only "
        "driver check; per-method recall and election invariants pinned "
        "in tests/test_dedup_ann.py.",
    tags=("ann",),
    oracle=None,
)
def ann_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from .dedup import _embeddings_with_dups

    q = _queries_df(spark, sf_dir)
    lsh = (ann.lsh_topk(_corpus(spark, sf_dir), q, k=K, n_planes=4,
                        dim=64, multiprobe=2)
           .select(F.lit("lsh").alias("method"), "query_id", "vec_id",
                   "cosine_sim", "rank"))
    path = _ivf_cache_path(sf_dir, n_centroids=16, kmeans_iter=5, seed=42)
    if not os.path.exists(path):
        ann.build_ivf_index(_corpus(spark, sf_dir), path, n_centroids=16,
                            kmeans_iter=5, seed=42)
    ivf = (ann.ivf_index_topk(spark, path, q, k=K, n_probe=4)
           .select(F.lit("ivf").alias("method"), "query_id", "vec_id",
                   "cosine_sim", "rank"))
    # SemDeDup rides the SAME persisted centroids the IVF index trained
    # (operators/ann.py semdedup docstring): no second k-means run —
    # on an IVF-indexed corpus semantic dedup is one assignment + one
    # within-cluster pass
    sem = (ann.semdedup(_embeddings_with_dups(spark, sf_dir),
                        threshold=0.99, vec_col="v", keep="far",
                        centroids=spark.read.parquet(f"{path}/centroids"))
           .select(F.lit("semdedup").alias("method"),
                   F.col("vec_id").alias("query_id"),
                   F.col("group_id").alias("vec_id"),
                   F.col("centroid_sim").alias("cosine_sim"),
                   F.when(F.col("is_canonical"), 1).otherwise(0)
                   .alias("rank")))
    return lsh.unionByName(ivf).unionByName(sem)
