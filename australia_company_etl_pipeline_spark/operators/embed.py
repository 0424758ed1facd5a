"""Model-free text embeddings: the feature-hashing trick, fully native.

``embed_documents`` maps a text column to a fixed-dimension
``array<double>`` bag-of-tokens vector (the HashingVectorizer /
Weinberger et al. 2009 construction): each token hashes to a bucket
(murmur3 % dim) with a second hash choosing ±1, buckets accumulate, and
the vector is L2-normalized. No vocabulary pass, no model artifact, no
Python — whole-stage-codegen expressions, O(tokens × dim) arithmetic
per row (keep ``dim`` in the tens-to-hundreds).

This is a LEXICAL embedding — cosine tracks token overlap, not meaning
(paraphrases with disjoint vocabulary stay far apart). What it buys:
every embedding consumer in the engine (``ann.brute_force_topk`` /
``lsh_topk`` / ``ivf_topk``, ``semdedup``, ``embedding_dup_pairs_lsh``)
now runs on a raw text corpus with no external encoder, and a real
model's vectors drop in later by swapping one column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens


def hashed_embedding(text: Column, dim: int = 64,
                     seed: int = 42) -> Column:
    """UNNORMALIZED signed feature-hashing vector of the whitespace
    tokens (same tokenization as the profile metrics). Two independent
    murmur3 hashes: bucket index, and a ±1 sign that keeps collision
    noise zero-mean (the trick's variance-reduction step). Use
    ``embed_documents`` for the L2-normalized, ANN-ready form — at the
    Column level the normalization would re-evaluate this O(tok×dim)
    aggregate (lambda exprs are outside codegen CSE)."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.aggregate(
        tokens(text),
        F.array_repeat(F.lit(0.0), dim),
        lambda a, t: F.zip_with(
            a, idx,
            lambda x, i: x + F.when(
                F.pmod(F.hash(t, F.lit(seed)), F.lit(dim)) == i,
                F.when(F.pmod(F.hash(t, F.lit(seed + 1)), F.lit(2)) == 0,
                       F.lit(1.0)).otherwise(F.lit(-1.0)))
            .otherwise(F.lit(0.0))))


def embed_documents(df: DataFrame, text_col: str,
                    out_col: str = "embedding", dim: int = 64,
                    seed: int = 42) -> DataFrame:
    """Append the L2-normalized hashed embedding as ``out_col``.

    The raw accumulator is staged in its own projection so the norm and
    the division read it once instead of re-running the aggregate
    (CollapseProject keeps a multiply-referenced non-trivial alias
    staged). All-zero vectors (empty/NULL-token texts) stay all-zero."""
    staged = df.withColumn("__he", hashed_embedding(F.col(text_col),
                                                    dim, seed))
    n = F.sqrt(F.aggregate(F.transform(F.col("__he"), lambda x: x * x),
                           F.lit(0.0), lambda s, x: s + x))
    staged = staged.withColumn("__hn", n)
    return (staged.withColumn(
        out_col,
        F.when(F.col("__hn") > 0,
               F.transform(F.col("__he"), lambda x: x / F.col("__hn")))
        .otherwise(F.col("__he")))
        .drop("__he", "__hn"))
