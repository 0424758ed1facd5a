"""Leakage-safe dataset splitting + cross-split contamination audit.

``deterministic_sample`` hashes DOC ids, which silently leaks: two
near-duplicate documents hash independently, so one lands in train and
its twin in test, and the eval measures memorization (the failure mode
Lee et al. 2022 §6 document — dedup exists precisely so eval
perplexity isn't inflated by seen text). The fix is structural, not
statistical: hash the near-dup CLUSTER id, so every member of a
cluster rides one bucket into one split.

- ``leakage_safe_split`` — docs + a ``dedup_clusters``-shaped
  ``(id, cluster_id)`` frame → docs + ``split``. Bucketing reuses the
  engine-portable ``textstats.sample_bucket`` rule (md5 or murmur3),
  so the assignment is reproducible across runs, layouts AND engines
  (the registered ``dedup_clusters`` oracle replays it in DuckDB on
  top of its recursive-CTE cluster check). Docs absent from the
  cluster frame are their own singleton cluster (their id) — a missing
  cluster row must not delete or co-locate unrelated docs.
- ``split_leakage_report`` — the audit for a split HOWEVER it was
  made: for each (eval split × train split) pair, count eval docs
  whose n-gram CONTAINMENT in some train doc clears the threshold
  (``dedup.containment_pairs`` — the GPT-3 embedded-leak metric, so a
  test passage pasted inside a long train doc still counts). The eval
  sides are the small sides, so candidates stay a broadcast equi-join.

Scale: split assignment is the cluster join plus a pure projection —
no extra shuffle, no window; the audit is one containment pass per
eval split over shared corpus shingles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import sample_bucket


def split_expr(cluster_id: Column, splits: dict[str, float],
               seed: int = 42, hash_fn: str = "murmur3") -> Column:
    """The split label for a cluster id: bucket = sample_bucket(
    cluster_id, seed) in [0, 1e6); cumulative fraction ranges in the
    dict's insertion order. Fractions must sum to 1 (±1e-9): a split
    spec that silently drops a tail bucket is a corrupt-dataset bug,
    not a default."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions sum to {total}, need 1.0")
    if any(f < 0 for f in splits.values()):
        raise ValueError("negative split fraction")
    bucket = sample_bucket([cluster_id, F.lit(seed)], hash_fn)
    out = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = bucket < int(round(cum * 1_000_000))
        out = F.when(cond, name) if out is None else out.when(cond, name)
    last = F.lit(names[-1])
    return last if out is None else out.otherwise(last)


def leakage_safe_split(docs: DataFrame, clusters: DataFrame,
                       splits: dict[str, float], id_col: str = "doc_id",
                       cluster_col: str = "cluster_id", seed: int = 42,
                       hash_fn: str = "murmur3") -> DataFrame:
    """Docs + ``split`` column, constant within each near-dup cluster.
    ``clusters`` carries ``(id_col, cluster_col)`` (``dedup_clusters``
    output); unlisted docs fall back to their own id (singleton)."""
    cl = clusters.select(F.col(id_col),
                         F.col(cluster_col).alias("__cl"))
    joined = docs.join(cl, id_col, "left")
    eff = F.coalesce(F.col("__cl"), F.col(id_col))
    return (joined.withColumn("split",
                              split_expr(eff, splits, seed, hash_fn))
            .drop("__cl"))


def split_leakage_report(docs: DataFrame, text_col: str, id_col: str,
                         split_col: str = "split",
                         train_split: str = "train",
                         threshold: float = 0.8,
                         shingle: int = 3) -> DataFrame:
    """→ one row per non-train split: ``(split, n_docs, n_leaky,
    leak_ratio)`` where leaky = the eval doc's n-grams are ≥threshold
    CONTAINED in some train doc. Run it after ANY split (including
    third-party ones) — a leakage-safe split of a deduplicated corpus
    reports 0; a doc-hash split of a corpus with surviving near-dups
    does not, which is the point."""
    from .dedup import containment_pairs

    train = docs.filter(F.col(split_col) == train_split)
    evals = (docs.filter(F.col(split_col) != train_split)
             .select(split_col, id_col, text_col))
    leaks = containment_pairs(
        train, evals.select(id_col, text_col), text_col, id_col,
        threshold=threshold, shingle=shingle)
    leaky = (leaks.select(F.col("benchmark_id").alias(id_col)).distinct()
             .withColumn("__leak", F.lit(1)))
    return (evals.join(leaky, id_col, "left")
            .groupBy(split_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.coalesce(F.sum("__leak"), F.lit(0)).alias("n_leaky"))
            .withColumn("leak_ratio",
                        F.round(F.col("n_leaky").cast("double")
                                / F.col("n_docs"), 6)))
