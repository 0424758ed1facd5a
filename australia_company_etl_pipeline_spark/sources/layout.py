"""Z-order (Morton) data layout for multi-column scan pruning.

Parquet data skipping works off per-file / per-row-group min-max
stats, which a sort can only make selective for its LEADING column: a
table range-sorted by ``x`` answers ``x BETWEEN`` by touching few
files, but every file spans the full ``y`` range, so a ``y`` (or
``x AND y`` box) predicate reads everything. Interleaving the bits of
both columns into one Morton key and range-sorting by THAT gives every
file a tight bounding box in BOTH dimensions — the standard lakehouse
layout trick (Delta/Iceberg ``OPTIMIZE ZORDER BY``) re-expressed as a
plain Spark write: the "index" is, again, just the table layout.

``zorder_value`` is a pure codegen expression (clamp → scale to
``bits``-bit ints → interleave via shift/or terms — no UDF, no
shuffle); ``write_zordered`` adds ONE repartitionByRange +
sortWithinPartitions on it, exactly the shuffle any clustered write
pays. Column bounds for the scaling either arrive from the caller
(metadata/catalog at product scale) or via one cheap min-max
aggregate (eager, documented).

At 100 TB this is the difference between "point-in-box telemetry
queries read the whole table" and "they read the handful of files
whose box intersects" — measured in tests by reading the written
files' parquet footer stats: the z-ordered layout prunes files on a
2-D box the single-column sort cannot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamp to [lo, hi] and scale to an integer in [0, 2^bits)."""
    span = hi - lo
    top = (1 << bits) - 1
    if span <= 0:
        return F.lit(0).cast("long")
    x = F.least(F.greatest(col.cast("double"), F.lit(float(lo))),
                F.lit(float(hi)))
    return F.least(
        F.floor((x - F.lit(float(lo))) / F.lit(span) * (top + 1))
        .cast("long"), F.lit(top).cast("long"))


def zorder_value(cols: list[Column],
                 bounds: list[tuple[float, float]],
                 bits: int = 16) -> Column:
    """The Morton key: bit ``b`` of scaled column ``i`` lands at output
    position ``b·n + i``. ``n·bits`` shift/or terms, all codegen.
    ``n·bits`` must fit a signed long (≤ 63 bits)."""
    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if n != len(bounds):
        raise ValueError("one (min, max) bound per column")
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a long; "
                         "lower bits")
    scaled = [_scaled(c, lo, hi, bits) for c, (lo, hi) in
              zip(cols, bounds)]
    out = F.lit(0).cast("long")
    for i, x in enumerate(scaled):
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)),
                            b * n + i))
    return out


def write_zordered(df: DataFrame, cols: list[str], path: str,
                   n_files: int = 16, bits: int = 16,
                   bounds: list[tuple[float, float]] | None = None,
                   mode: str = "errorifexists") -> None:
    """Write ``df`` to parquet clustered by the Morton key of ``cols``.

    ``bounds=None`` runs ONE min-max aggregate over the frame (an
    eager driver action — pass catalog-known bounds to stay lazy; at
    product scale the writer pipeline knows its domains). The key is
    computed, range-partitioned into ``n_files`` ranges, sorted within
    each, and DROPPED — the layout, not a column, carries the
    information."""
    if bounds is None:
        row = df.agg(*[f(F.col(c)).alias(f"{g}_{c}")
                       for c in cols
                       for f, g in ((F.min, "lo"), (F.max, "hi"))]).head()
        bounds = [(float(row[f"lo_{c}"]), float(row[f"hi_{c}"]))
                  for c in cols]
    z = zorder_value([F.col(c) for c in cols], bounds, bits)
    (df.withColumn("__z", z)
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode(mode).parquet(path))
