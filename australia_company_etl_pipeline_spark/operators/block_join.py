"""Blocking join — the engine's core candidate-pair generator (SURVEY §2.9 M7,
§2.3 J1/J4).

The reference expresses this as ``crawl.join(broadcast(abr), on=block_key)``
(``/root/reference/src/transform/entity_match.py:494-498``) — and broadcasts
the 2M-row ABR side, which only works because its rows are narrow. Here the
broadcast side is an explicit choice with a sane default: broadcast the
side the caller declares small, else let AQE decide from runtime stats.

Scale notes (100 TB):
- blocking bounds the pair explosion (the whole point: ~600B naive pairs →
  <1M with 4-char keys per the reference README:214-227);
- an equi-join on block_key shuffles both sides by key — skewed blocks
  (e.g. very common prefixes) are handled by AQE skew-join splitting,
  enabled in our session factory;
- `salt_keys > 1` additionally salts the big side and explodes the small
  side for pathological single-key skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_join(left: DataFrame, right: DataFrame,
               key: str = "block_key",
               how: str = "inner",
               broadcast_side: str | None = "auto",
               salt_keys: int = 1) -> DataFrame:
    """Equi-join two sides on a blocking key, aliased ``l``/``r``.

    broadcast_side: 'left' | 'right' | 'auto' (AQE decides) | None.
    salt_keys > 1: skew-salt the join (left side gets a random salt in
    [0, salt_keys); right side is exploded across all salts).
    """
    lhs, rhs = left.alias("l"), right.alias("r")
    if salt_keys > 1:
        lhs = lhs.withColumn(
            "__salt", (F.rand(seed=42) * salt_keys).cast("int"))
        rhs = rhs.withColumn(
            "__salt", F.explode(F.array([F.lit(i) for i in range(salt_keys)])))
        cond = (F.col(f"l.{key}") == F.col(f"r.{key}")) & \
               (lhs["__salt"] == rhs["__salt"])
    else:
        cond = F.col(f"l.{key}") == F.col(f"r.{key}")

    if broadcast_side == "left":
        lhs = F.broadcast(lhs)
    elif broadcast_side == "right":
        rhs = F.broadcast(rhs)
    # 'auto'/None: leave it to Catalyst + AQE (runtime-size based)

    joined = lhs.join(rhs, cond, how)
    return joined.drop("__salt") if salt_keys > 1 else joined


def similarity_join(left: DataFrame, right: DataFrame,
                    scorer, threshold: float,
                    key: str = "block_key",
                    score_col: str = "score",
                    broadcast_side: str | None = "auto") -> DataFrame:
    """J4 — blocking join + similarity θ-predicate: the explicit library
    form of ``similarity(a,b) >= θ`` (kept as an operator, not a Catalyst
    rule — SURVEY §4.3).

    ``scorer(l_col, r_col) -> Column`` computes pairwise similarity.
    """
    pairs = block_join(left, right, key=key, broadcast_side=broadcast_side)
    scored = pairs.withColumn(score_col, scorer(F.col("l.normalized_name"),
                                                F.col("r.normalized_name")))
    return scored.filter(F.col(score_col) >= threshold)
