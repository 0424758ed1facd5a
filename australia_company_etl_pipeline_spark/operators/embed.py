"""Model-free text embeddings: the feature-hashing trick, fully native.

``embed_documents`` maps a text column to a fixed-dimension
``array<double>`` bag-of-tokens vector (the HashingVectorizer /
Weinberger et al. 2009 construction): each token hashes to a bucket
(hash % dim) with a sign bit keeping collision noise zero-mean, buckets
accumulate, and the vector is L2-normalized. No vocabulary pass, no
model artifact, no Python — whole-stage-codegen expressions,
O(tokens × dim) arithmetic per row (keep ``dim`` in the
tens-to-hundreds).

Two hash backends:

- ``hash_fn='native'`` (default) — two independent murmur3 hashes
  (``F.hash`` with different seeds) for bucket and sign. Fastest; the
  values are Spark-specific.
- ``hash_fn='portable'`` — ONE FNV-1a-32 over the token's code points
  (seed XOR-folded into the offset basis), bucket from the low bits
  (``h % dim``), sign from bit 16. FNV is four arithmetic ops per
  character, expressible identically in any SQL engine with list
  lambdas — this is how the driver oracle value-checks the embedding
  end-to-end in DuckDB (``plans/dedup.py`` inlines the same constants).
  Slower (per-character aggregate) but exact-twin-able.

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

FNV_BASIS = 2166136261
FNV_PRIME = 16777619
_U32 = 1 << 32


def fnv1a32(s: Column, seed: int = 0) -> Column:
    """FNV-1a 32-bit over the string's code points, with ``seed``
    XOR-folded into the offset basis. Portable: the same fold in any
    engine with a list-reduce (DuckDB twin in ``plans/dedup.py``)
    produces bit-identical values for BMP text — verified for ASCII and
    non-ASCII BMP code points (é=233, 日=26085 in both engines).
    Boundary: astral-plane characters (emoji, U+10000+) split into
    UTF-16 surrogate pairs under Spark's ``split`` but single code
    points under DuckDB, so cross-engine parity ends at the BMP; the
    hash itself stays deterministic per engine either way."""
    chars = F.filter(F.split(s, ""), lambda c: c != "")
    return F.aggregate(
        chars, F.lit((FNV_BASIS ^ seed) % _U32).cast("long"),
        lambda h, c: F.pmod(h.bitwiseXOR(F.ascii(c)) * F.lit(FNV_PRIME),
                            F.lit(_U32)))


def fnv1a32_pair(s: Column, seed_a: int, seed_b: int) -> Column:
    """Both seeded FNV-1a folds of ``fnv1a32`` in ONE pass over the
    string: a two-slot struct accumulator shares the char split and the
    per-char iteration that two separate calls would each repeat —
    strictly less work at any scale, modest measured win (the fold
    arithmetic dominates; the portable SimHash path needs a low/high
    fingerprint half per token). Returns
    ``struct(h1, h2)`` bit-identical to
    ``(fnv1a32(s, seed_a), fnv1a32(s, seed_b))``."""
    chars = F.filter(F.split(s, ""), lambda c: c != "")
    init = F.struct(
        F.lit((FNV_BASIS ^ seed_a) % _U32).cast("long").alias("h1"),
        F.lit((FNV_BASIS ^ seed_b) % _U32).cast("long").alias("h2"))
    return F.aggregate(
        chars, init,
        lambda acc, c: F.struct(
            F.pmod(acc["h1"].bitwiseXOR(F.ascii(c)) * F.lit(FNV_PRIME),
                   F.lit(_U32)).alias("h1"),
            F.pmod(acc["h2"].bitwiseXOR(F.ascii(c)) * F.lit(FNV_PRIME),
                   F.lit(_U32)).alias("h2")))


def _token_bucket_sign(t: Column, dim: int, seed: int,
                       hash_fn: str) -> Column:
    """(bucket, sign) struct for one token under the chosen backend."""
    if hash_fn == "native":
        b = F.pmod(F.hash(t, F.lit(seed)), F.lit(dim))
        s = F.when(F.pmod(F.hash(t, F.lit(seed + 1)), F.lit(2)) == 0,
                   F.lit(1.0)).otherwise(F.lit(-1.0))
    elif hash_fn == "portable":
        h = fnv1a32(t, seed)
        b = F.pmod(h, F.lit(dim))
        s = F.when(F.shiftright(h, 16).bitwiseAND(F.lit(1)) == 0,
                   F.lit(1.0)).otherwise(F.lit(-1.0))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}: "
                         "use 'native' or 'portable'")
    return F.struct(b.alias("b"), s.alias("s"))


def hashed_embedding(text: Column, dim: int = 64, seed: int = 42,
                     hash_fn: str = "native") -> Column:
    """UNNORMALIZED signed feature-hashing vector of the whitespace
    tokens (same tokenization as the profile metrics). Each token's
    (bucket, sign) pair is computed ONCE (staged via ``transform``),
    then folded into the accumulator — the hash never re-evaluates per
    dimension. Use ``embed_documents`` for the L2-normalized, ANN-ready
    form — at the Column level the normalization would re-evaluate this
    O(tok×dim) aggregate (lambda exprs are outside codegen CSE)."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    hs = F.transform(tokens(text),
                     lambda t: _token_bucket_sign(t, dim, seed, hash_fn))
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.aggregate(
        hs,
        F.array_repeat(F.lit(0.0), dim),
        lambda a, t: F.zip_with(
            a, idx,
            lambda x, i: x + F.when(t["b"] == i, t["s"])
            .otherwise(F.lit(0.0))))


def embed_documents(df: DataFrame, text_col: str,
                    out_col: str = "embedding", dim: int = 64,
                    seed: int = 42,
                    hash_fn: str = "native") -> DataFrame:
    """Append the L2-normalized hashed embedding as ``out_col``.

    The raw accumulator is staged in its own projection so the norm and
    the division read it once instead of re-running the aggregate
    (CollapseProject keeps a multiply-referenced non-trivial alias
    staged). All-zero vectors (empty/NULL-token texts) stay all-zero."""
    staged = df.withColumn("__he", hashed_embedding(F.col(text_col),
                                                    dim, seed, hash_fn))
    n = F.sqrt(F.aggregate(F.transform(F.col("__he"), lambda x: x * x),
                           F.lit(0.0), lambda s, x: s + x))
    staged = staged.withColumn("__hn", n)
    return (staged.withColumn(
        out_col,
        F.when(F.col("__hn") > 0,
               F.transform(F.col("__he"), lambda x: x / F.col("__hn")))
        .otherwise(F.col("__he")))
        .drop("__he", "__hn"))
