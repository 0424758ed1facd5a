"""Distributed Bloom filter as a DataFrame sketch (r7).

At 100 TB the expensive shape in every incremental pipeline is "which
of this batch's keys has the history seen before?" — an equi-join
against a billions-row key index. A Bloom filter built ONCE over the
history answers "definitely new" for most of a fresh batch at
O(m/64) storage, so only the maybe-seen minority pays the real join
(and, with a partitioned index, only their buckets are scanned).

Representation: ``(word_idx: long, bits: long)`` rows — 63 usable bits
per word (bit 63 never set, so the word stays positive in every
signed-BIGINT engine; sign games are where cross-engine bit code goes
to die). Absent words are all-zero. Building is ONE explode +
partial-aggregated ``bit_or`` shuffle with at most ``m_bits/63`` output
rows; map-side combine collapses hot words, so skew is structural, not
operational.

Hashing (Kirsch–Mitzenmacher double hashing, the standard k-from-2
construction): position_i = (h1 + i·h2) mod m_bits.
``hash_fn='xxhash64'`` is the fast engine-native path;
``hash_fn='md5'`` derives h1/h2 from hex slices of md5 — the
engine-portable twin the DuckDB oracle replays bit-for-bit (same
discipline as textstats.sample_bucket / the portable MinHash backend).

No false negatives by construction; the false-positive rate is
``(1-e^{-kn/m})^k`` — ``bloom_stats`` reports the observed fill and
that estimate so an operator can tell when the filter needs a rebuild
at a larger ``m_bits``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 63


def _h1_h2(key: Column, hash_fn: str) -> tuple[Column, Column]:
    if hash_fn == "xxhash64":
        # two independent streams via literal salting; pmod keeps the
        # double-hash arithmetic in nonnegative territory
        h1 = F.pmod(F.xxhash64(key), F.lit(2**31))
        h2 = F.pmod(F.xxhash64(F.lit("bloom2"), key), F.lit(2**31))
    elif hash_fn == "md5":
        hx = F.md5(key.cast("string"))
        h1 = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
        h2 = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}: 'xxhash64' or 'md5'")
    return h1, h2


def bloom_positions(key: Column, m_bits: int, k: int,
                    hash_fn: str = "xxhash64") -> Column:
    """array<long> of the k bit positions for a key (double hashing)."""
    h1, h2 = _h1_h2(key, hash_fn)
    return F.array(*[(h1 + F.lit(i) * h2) % F.lit(m_bits)
                     for i in range(k)])


def build_bloom(df: DataFrame, key: Column, m_bits: int, k: int = 5,
                hash_fn: str = "xxhash64") -> DataFrame:
    """Build the filter over every key in ``df``: ONE explode +
    partial-agg ``bit_or`` shuffle → ≤ m_bits/63 ``(word_idx, bits)``
    rows. NULL keys are skipped (a NULL is not a member)."""
    # filter the KEY, not the positions: xxhash64 hashes a NULL to the
    # seed value (it never returns NULL), so a position-level filter
    # would silently admit NULL as a member
    pos = (df.filter(key.isNotNull())
           .select(F.explode(bloom_positions(key, m_bits, k, hash_fn))
                   .alias("__pos")))
    return (pos
            .groupBy(F.floor(F.col("__pos") / BITS_PER_WORD).cast("long")
                     .alias("word_idx"))
            # F.shiftleft only takes a literal shift — the SQL form
            # accepts a column expression
            .agg(F.bit_or(F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(__pos % {BITS_PER_WORD} AS INT))")).alias("bits")))


def bloom_probe(df: DataFrame, key: Column, bloom: DataFrame, m_bits: int,
                k: int = 5, hash_fn: str = "xxhash64",
                id_col: str = "doc_id",
                out_col: str = "maybe_seen") -> DataFrame:
    """Tag each row of ``df``: ``out_col`` False ⇒ the key is DEFINITELY
    not in the filter (no false negatives); True ⇒ maybe seen, pay the
    real lookup. NULL keys probe as False.

    Shape: the k positions explode (O(k·|df|)), broadcast-join the
    word table (m_bits/63 rows — a 2^27-bit filter is ~32 MB, squarely
    broadcastable), one partial-agg back to row grain, equi-join onto
    ``df``. The probe side is the BATCH in the incremental use case —
    the small side — so this costs O(batch), never O(history).
    """
    pos = (df.filter(key.isNotNull())
           .select(id_col,
                   F.posexplode(bloom_positions(key, m_bits, k, hash_fn))
                   .alias("__i", "__pos")))
    hit = (pos
           .withColumn("word_idx",
                       F.floor(F.col("__pos") / BITS_PER_WORD).cast("long"))
           .join(F.broadcast(bloom), "word_idx", "left")
           .withColumn(
               "__hit",
               F.coalesce(
                   F.expr(f"shiftright(bits, CAST(__pos % "
                          f"{BITS_PER_WORD} AS INT))")
                   .bitwiseAND(F.lit(1)) == 1,
                   F.lit(False)))
           .groupBy(id_col)
           .agg(F.bool_and("__hit").alias(out_col)))
    return df.join(hit, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(False)))


def bloom_stats(bloom: DataFrame, m_bits: int, k: int = 5) -> DataFrame:
    """One row: set-bit count, fill ratio, and the implied
    false-positive estimate fill^k — the rebuild-trigger metric (past
    ~50% fill the filter stops earning its keep)."""
    return (bloom
            .agg(F.coalesce(F.sum(F.bit_count("bits")), F.lit(0))
                 .alias("set_bits"))
            .select(
                "set_bits",
                (F.col("set_bits").cast("double") / F.lit(float(m_bits)))
                .alias("fill_ratio"),
                F.pow(F.col("set_bits").cast("double") / F.lit(float(m_bits)),
                      F.lit(float(k))).alias("fpr_estimate")))
