"""Count-Min sketch as a DataFrame: mergeable frequency estimation.

Cormode & Muthukrishnan 2005 — the frequency twin of the Bloom filter
(``operators/bloom.py``): where Bloom answers "seen at all?", CMS
answers "roughly how often?" in ``depth × width`` counters regardless
of how many distinct keys flow through. The 100 TB uses:

- **heavy hitters without a vocabulary pass** — probe candidate terms
  against a sketch instead of materializing the full
  explode-group-count (whose output is as big as the vocabulary);
- **per-partition sketches that MERGE** — counters are sums, so
  sketch(A ∪ B) == merge(sketch(A), sketch(B)) EXACTLY (pinned in
  tests): each executor/day/shard sketches locally and a union+sum
  folds them, the classic distributed-monoid shape;
- **streaming rates** — a per-trigger sketch merged into a persisted
  one tracks key frequencies with O(depth·width) state.

Guarantees: estimates never undercount; they overcount by at most
``ε·N`` with probability ``1-δ`` for ``width = ⌈e/ε⌉``, ``depth =
⌈ln 1/δ⌉`` (collisions only ever ADD).

Representation: sparse ``(row_idx, col_idx, cnt)`` rows — absent
counters are zero. Building is ONE posexplode + partial-aggregated sum
shuffle bounded by ``depth·width`` output rows; hot keys collapse
map-side. Hashing reuses the Bloom module's Kirsch–Mitzenmacher double
hashing: ``col_i = (h1 + i·h2) mod width`` with ``hash_fn='xxhash64'``
(fast) or ``'md5'`` (engine-portable — the DuckDB oracle replays every
counter and every probe estimate bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bloom import _h1_h2


def cms_positions(key: Column, depth: int, width: int,
                  hash_fn: str = "xxhash64") -> Column:
    """array<long> of the per-row column indexes for a key."""
    h1, h2 = _h1_h2(key, hash_fn)
    return F.array(*[(h1 + F.lit(i) * h2) % F.lit(width)
                     for i in range(depth)])


def build_cms(df: DataFrame, key: Column, depth: int = 4,
              width: int = 1024, hash_fn: str = "xxhash64",
              weight: Column | None = None) -> DataFrame:
    """Sketch every key in ``df`` → ``(row_idx, col_idx, cnt)``.
    ``weight`` switches from occurrence counting to weighted sums
    (e.g. token counts per doc already aggregated upstream). NULL keys
    are skipped — a NULL contributes no frequency."""
    w = F.lit(1).cast("long") if weight is None else weight.cast("long")
    pos = (df.filter(key.isNotNull())
           .select(F.posexplode(cms_positions(key, depth, width, hash_fn))
                   .alias("row_idx", "col_idx"),
                   w.alias("__w")))
    return (pos.groupBy(F.col("row_idx").cast("int").alias("row_idx"),
                        "col_idx")
            .agg(F.sum("__w").alias("cnt")))


def merge_cms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two same-parameter sketches: union + sum. Counters are
    sums, so this is EXACT — sketch-then-merge equals sketch-of-union
    (the distributed-monoid property the per-shard build relies on)."""
    return (a.unionByName(b)
            .groupBy("row_idx", "col_idx")
            .agg(F.sum("cnt").alias("cnt")))


def cms_estimate(df: DataFrame, key: Column, cms: DataFrame,
                 depth: int = 4, width: int = 1024,
                 hash_fn: str = "xxhash64", id_col: str | None = None,
                 out_col: str = "cms_count") -> DataFrame:
    """Point-query each row's key: ``out_col`` = min over the depth
    counters (a missing counter reads 0). Never undercounts.

    Shape: depth probe rows per input row, broadcast-join the sketch
    (≤ depth·width rows — a 4×2^20 sketch is ~100 MB of longs at
    worst, sized to broadcast), partial-agg min back to row grain.
    The probe side is the SMALL side in the heavy-hitter use case, so
    this costs O(probes), never O(corpus).
    """
    keyed = df if id_col is not None else \
        df.withColumn("__cms_id", F.monotonically_increasing_id())
    idc = id_col or "__cms_id"
    pos = (keyed.filter(key.isNotNull())
           .select(idc,
                   F.posexplode(cms_positions(key, depth, width, hash_fn))
                   .alias("row_idx", "col_idx")))
    est = (pos.withColumn("row_idx", F.col("row_idx").cast("int"))
           .join(F.broadcast(cms), ["row_idx", "col_idx"], "left")
           .groupBy(idc)
           .agg(F.min(F.coalesce("cnt", F.lit(0))).alias(out_col)))
    out = (keyed.join(est, idc, "left")
           .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0))))
    return out.drop("__cms_id") if id_col is None else out
