"""Mergeable distinct-count sketches (HLL, Apache DataSketches).

The third sketch in the trio (``bloom.py`` membership, ``cms.py``
frequency, this one cardinality): "how many DISTINCT urls / tokens /
users does each shard hold, and the corpus overall?" without a
``count(distinct)`` whose state grows with the answer.

Spark 3.5+ ships the DataSketches HLL as built-ins
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) —
this module is the thin product surface that makes the MERGEABLE shape
first-class, because that is the part ad-hoc callers get wrong:

- ``distinct_sketch`` — one sketch row per group: ``lg_k`` buckets of
  state per group REGARDLESS of cardinality, vs exact
  ``countDistinct`` whose hash-set state is O(distinct) per group;
- ``merge_sketches`` — fold sketches across groups (days, shards,
  partitions): union-then-estimate equals sketching the union within
  HLL's error bound, so per-day sketches persisted next to the data
  answer any date-range distinct question WITHOUT re-scanning the
  range (the flat-growth shape ``incremental_dedup`` uses for
  membership, applied to cardinality);
- ``distinct_estimate`` — read the number out.

Error: ~1.04/√2^lg_k relative (lg_k=12 → ~1.6%); estimates are
pinned against exact counts in tests within 3σ. The sketch binary is
engine-specific (DataSketches format) → the operator is pytest-gated,
not DuckDB-oracled; the profiler's ``approx_count_distinct`` covers
the in-plan HLL++ path already.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch(df: DataFrame, key: Column,
                    group_cols: list[str] | None = None,
                    lg_k: int = 12,
                    out_col: str = "hll_sketch") -> DataFrame:
    """One HLL sketch per group (or one row total) over ``key``.
    NULL keys contribute nothing (SQL distinct-count semantics). ONE
    partial-aggregated shuffle; state per group is 2^lg_k bytes-ish,
    never O(distinct)."""
    agg = F.hll_sketch_agg(key, F.lit(lg_k)).alias(out_col)
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def merge_sketches(df: DataFrame, sketch_col: str = "hll_sketch",
                   group_cols: list[str] | None = None,
                   lg_k: int = 12) -> DataFrame:
    """Union sketches across rows (per remaining group, or to one
    row): the day→month→all rollup without touching raw data.
    ``allowDifferentLgConfigK`` stays False — silently unioning
    sketches built at different precisions is a config bug worth
    failing on."""
    agg = F.hll_union_agg(F.col(sketch_col), F.lit(False)) \
        .alias(sketch_col)
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def distinct_estimate(df: DataFrame, sketch_col: str = "hll_sketch",
                      out_col: str = "n_distinct") -> DataFrame:
    """Sketch rows → estimates (adds ``out_col``, keeps the sketch so
    callers can keep folding)."""
    return df.withColumn(out_col,
                         F.hll_sketch_estimate(F.col(sketch_col)))
