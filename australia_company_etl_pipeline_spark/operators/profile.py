"""Column profiling — one-pass table statistics + heavy hitters.

The reference collects table-level quality metrics one SQL statement at
a time into ``data_quality_metrics``
(``/root/reference/src/load/create_tables.sql:130-137``; dbt test
queries under ``/root/reference/dbt/models/*/schema.yml`` each issue a
separate scan per check).  A 100 TB corpus cannot afford a scan per
metric: ``profile_metrics`` builds EVERY per-column statistic (null
rate, distinct count, min/max/mean, exact or approximate percentiles,
string-length stats) as expressions over ONE aggregate, reusing
``quality_metrics``'s single-scan unpivot, and ``top_values`` finds
per-column heavy hitters with one partial-aggregated shuffle for ALL
profiled columns together.

Scale design (100 TB lens):

- **Exact vs sketch distinct counts.** ``distinct='exact'`` plans one
  ``count(DISTINCT col)`` per column; Catalyst lowers k distinct
  aggregates into an ``Expand`` node that replicates every input row
  k+1 times before the shuffle — fine at audit scale, a k× input
  blowup at corpus scale.  ``distinct='approx'`` swaps in
  HyperLogLog++ (``approx_count_distinct``, default rsd 5%), an
  ordinary partial aggregate: no Expand, map-side combine, constant
  sketch size per column.  The plan delta is pinned by
  ``tests/test_plan_shapes.py`` (Expand present iff exact).
- **Exact vs sketch percentiles.** ``percentile_mode='exact'``
  (``F.percentile``) buffers each group's values — only viable when
  one table's rows fit an executor spill budget; ``'approx'``
  (``F.percentile_approx``, Greenwald-Khanna) is mergeable with bounded
  memory at any scale.
- **Heavy hitters.** ``top_values`` explodes each row into (column,
  value) pairs — k columns cost one k× flat-map, NOT k scans — then
  one partial-aggregated ``groupBy``; hot values collapse map-side, so
  the shuffle carries one row per distinct (column, value).  The final
  top-k ranking windows over ``column_name`` (few partitions = a
  funnel IF the distinct-value set is huge): ``min_count`` prunes the
  long tail BEFORE the window, bounding its input — at corpus scale
  pass a threshold like ``rows // 1000`` (a value seen less often is
  not a "heavy hitter" by any definition you'd report).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (DateType, NumericType, StringType,
                               TimestampType)
from pyspark.sql.window import Window

from .audit import quality_metrics


def _safe_col(name: str) -> Column:
    """Column reference that treats a literal dot as part of the NAME,
    never as struct access.  On PySpark 4.x BOTH ``F.col("a.b")`` and
    ``df["a.b"]`` parse the dot as a struct path at analysis time
    (``UNRESOLVED_COLUMN`` on a legal JSON-ingest column named
    ``a.b``); backtick-quoting — with embedded backticks doubled, the
    SQL identifier escape — is the only spelling that resolves
    positionally."""
    return F.col("`" + name.replace("`", "``") + "`")


def _davg(col: Column) -> Column:
    """Order-independent mean: decimal-accumulated sum / non-null count
    (same idiom as plans.core.davg — doubles summed in shuffle order
    drift in the last ulp between runs; decimal accumulation does not).
    NULLs are excluded from both numerator and denominator; an all-NULL
    column yields NULL."""
    return (F.sum(col.cast("decimal(30,6)")).cast("double")
            / F.count(col))


def profile_metrics(df: DataFrame, cols: list[str] | None = None, *,
                    distinct: str = "exact",
                    rsd: float = 0.05,
                    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75),
                    percentile_mode: str = "exact",
                    accuracy: int = 10000) -> dict[str, Column]:
    """Per-column statistics as a ``{metric_name: aggregate_expression}``
    dict — compose with other metrics and evaluate in ONE scan via
    ``quality_metrics`` (``profile_table`` below does exactly that).

    Every column gets ``<col>.null_rate`` and ``<col>.n_distinct``
    (exact or HLL++ per ``distinct`` — see module doc for the Expand
    trade); numerics add min/max/decimal-mean and one ``p<pct>`` per
    requested percentile (exact or GK-sketch per ``percentile_mode``);
    strings add length min/max/mean; dates/timestamps add epoch-second
    min/max.  Ratios and means are rounded to 6 dp so results are
    engine- and order-stable.

    Float/double columns additionally get ``<col>.nan_rate`` and
    ``<col>.inf_rate``, and their NaN/±inf values are EXCLUDED from
    min/max/mean/percentiles — a NaN would poison max() and the
    percentiles outright, and BOTH NaN and ±inf silently deflate the
    decimal-accumulated mean (the decimal cast turns them into NULL,
    leaving the numerator while staying in a row-count denominator).
    One rule: the stats describe the finite values; the anomalies
    surface as their own rates instead of corrupting the stats.

    Column names containing a dot are supported (resolved positionally,
    not parsed as struct access), but note the emitted metric keys use
    ``.`` as the column/metric separator, so such names make keys like
    ``a.b.null_rate`` ambiguous to downstream string-splitters.
    """
    if distinct not in ("exact", "approx"):
        raise ValueError(f"distinct must be 'exact' or 'approx', "
                         f"got {distinct!r}")
    if percentile_mode not in ("exact", "approx"):
        raise ValueError(f"percentile_mode must be 'exact' or 'approx', "
                         f"got {percentile_mode!r}")
    types = {f.name: f.dataType for f in df.schema}
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in types]
    if missing:
        raise ValueError(f"profile columns not in frame: {missing}")

    from pyspark.sql.types import DoubleType, FloatType

    out: dict[str, Column] = {}
    for c in cols:
        col, t = _safe_col(c), types[c]
        out[f"{c}.null_rate"] = F.round(
            _davg(F.when(col.isNull(), 1.0).otherwise(0.0)), 6)
        out[f"{c}.n_distinct"] = (
            F.countDistinct(col) if distinct == "exact"
            else F.approx_count_distinct(col, rsd))
        if isinstance(t, (FloatType, DoubleType)):
            inf = F.abs(col) == float("inf")
            out[f"{c}.nan_rate"] = F.round(
                _davg(F.when(col.isNotNull() & F.isnan(col), 1.0)
                      .otherwise(0.0)), 6)
            out[f"{c}.inf_rate"] = F.round(
                _davg(F.when(col.isNotNull() & inf, 1.0)
                      .otherwise(0.0)), 6)
            # NaN/±inf → NULL for the stats (finite-values-only rule)
            col = F.when(~F.isnan(col) & ~inf, col)
        if isinstance(t, NumericType):
            out[f"{c}.min"] = F.min(col)
            out[f"{c}.max"] = F.max(col)
            out[f"{c}.mean"] = F.round(_davg(col), 6)
            for p in percentiles:
                pct = (F.percentile(col, F.lit(p))
                       if percentile_mode == "exact"
                       else F.percentile_approx(col, F.lit(p),
                                                F.lit(accuracy)))
                # %g keeps p25/p50/p75 short but does NOT collapse
                # distinct tails (p0.1 vs p0.5) into one rounded label
                name = f"{c}.p{p * 100:g}"
                if name in out:
                    raise ValueError(
                        f"duplicate percentile {p} for column {c!r}")
                out[name] = F.round(pct, 6)
        elif isinstance(t, StringType):
            out[f"{c}.len_min"] = F.min(F.length(col))
            out[f"{c}.len_max"] = F.max(F.length(col))
            out[f"{c}.len_mean"] = F.round(_davg(F.length(col)), 6)
        elif isinstance(t, (DateType, TimestampType)):
            out[f"{c}.min_s"] = F.min(col.cast("timestamp").cast("long"))
            out[f"{c}.max_s"] = F.max(col.cast("timestamp").cast("long"))
    return out


def profile_table(df: DataFrame, table_name: str,
                  cols: list[str] | None = None,
                  run_id: str | None = None,
                  **kwargs) -> DataFrame:
    """``profile_metrics`` evaluated and unpivoted to the
    ``data_quality_metrics`` long contract (run_id, table_name,
    metric_name, metric_value) — one scan, one aggregate, regardless of
    how many columns are profiled.  ``kwargs`` forward to
    ``profile_metrics`` (distinct/percentile modes etc.)."""
    return quality_metrics(df, table_name,
                           profile_metrics(df, cols, **kwargs),
                           run_id=run_id)


def top_values(df: DataFrame, cols: list[str], k: int = 3,
               min_count: int = 1) -> DataFrame:
    """Per-column heavy hitters: the ``k`` most frequent non-null values
    of each listed column, as (column_name, value, n, rank) with rank
    1..k per column (ties broken by value ascending — deterministic).

    One flat-map (explode of a column_name→value map — values travel as
    strings so heterogeneous columns share one shuffle) + ONE
    partial-aggregated groupBy for all columns together; NULLs are
    excluded (they are a null_rate metric, not a value).  ``min_count``
    prunes the tail before the per-column ranking window — set it at
    scale (see module doc) so the window input stays bounded.
    """
    if not cols:
        raise ValueError("top_values needs at least one column; got none")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"top_values columns not in frame: {missing}")
    if len(set(cols)) != len(cols):
        # would otherwise surface as an opaque executor-side
        # DUPLICATED_MAP_KEY failure from map_from_arrays
        raise ValueError(f"top_values columns must be unique: {cols}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pairs = df.select(F.explode(F.map_from_arrays(
        F.array(*[F.lit(c) for c in cols]),
        F.array(*[_safe_col(c).cast("string") for c in cols]),
    )).alias("column_name", "value")).filter(F.col("value").isNotNull())
    counts = (pairs.groupBy("column_name", "value")
              .agg(F.count(F.lit(1)).alias("n"))
              .filter(F.col("n") >= min_count))
    w = Window.partitionBy("column_name").orderBy(F.desc("n"),
                                                 F.asc("value"))
    return (counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def histogram(df: DataFrame, col: str, bins: int = 10,
              lo: float | None = None,
              hi: float | None = None) -> DataFrame:
    """Equi-width histogram of a numeric column: one row per occupied
    bin — (bin, bin_lo, bin_hi, n), bin 0..bins-1, upper edge inclusive
    in the last bin.  NULLs and NaNs are excluded (they are
    ``null_rate``-style metrics, not bins; a NaN would otherwise poison
    ``max()`` and collapse the whole report to one bin); values outside
    caller-supplied bounds — including infinities — clamp into the edge
    bins (so a histogram over known physical bounds never silently
    drops rows).

    Scale: when bounds are given the plan is ONE partial-aggregated
    groupBy on the bin id (≤ ``bins`` reducer rows regardless of input
    size).  When bounds are omitted they come from a min/max aggregate
    first — a second (cheap, shuffle-free to one row) pass; pass bounds
    at 100 TB if the extra scan matters.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if lo is not None and hi is not None and lo > hi:
        # the degenerate one-bin branch below is for DERIVED equal
        # bounds (constant column); swapped caller arguments must not
        # silently collapse the report into one fabricated bin
        raise ValueError(f"inverted bounds: lo ({lo}) > hi ({hi})")
    v = _safe_col(col).cast("double")
    df = df.filter(v.isNotNull() & ~F.isnan(v))
    if lo is None or hi is None:
        # derive bounds from FINITE values only — a single ±inf as the
        # derived bound makes width infinite and floor-divides every
        # finite value into one garbage bin; the infinities themselves
        # still count (they clamp into the edge bins below)
        finite = F.when((v > float("-inf")) & (v < float("inf")), v)
        row = df.agg(F.min(finite).alias("lo"),
                     F.max(finite).alias("hi")).collect()[0]
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
        if lo is None or hi is None:  # no finite values to bound by
            return df.sparkSession.createDataFrame(
                [], "bin int, bin_lo double, bin_hi double, n long")
    if lo > hi:
        # a caller-supplied bound that excludes all derived data (e.g.
        # lo=100 over a column maxing at 50) must fail loudly like the
        # both-supplied inverted case above — the degenerate branch
        # below would fabricate one out-of-range bin
        raise ValueError(f"inverted bounds after derivation: lo ({lo}) "
                         f"> hi ({hi}) — the supplied bound excludes "
                         "every value in the column")
    if lo == hi:
        # degenerate range (constant column): everything in one bin
        bins, width = 1, 1.0
    else:
        width = (hi - lo) / bins
    # clamp the VALUE into [lo, hi] before any integer math: a far-out
    # outlier (or ±inf) would overflow the long→int cast under ANSI
    # instead of landing in the edge bin the docstring promises
    vc = F.least(F.lit(float(hi)), F.greatest(F.lit(float(lo)), v))
    bin_id = F.least(F.lit(bins - 1), F.floor(
        (vc - F.lit(lo)) / F.lit(width)).cast("int"))
    return (df
            .groupBy(bin_id.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select("bin",
                    (F.lit(lo) + F.col("bin") * width).alias("bin_lo"),
                    (F.lit(lo) + (F.col("bin") + 1) * width)
                    .alias("bin_hi"),
                    "n"))


def schema_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema diff between two snapshots of "the same" table: one row
    per added / removed / retyped column — (column_name, change,
    old_type, new_type).  Pure metadata (no job runs); the companion to
    ``audit_log_diff`` (row drift) and ``profile_drift`` (value drift).
    An empty result = schemas compatible."""
    o = {f.name: f.dataType.simpleString() for f in old.schema}
    n = {f.name: f.dataType.simpleString() for f in new.schema}
    rows = [(c, "removed", o[c], None) for c in o if c not in n]
    rows += [(c, "added", None, n[c]) for c in n if c not in o]
    rows += [(c, "retyped", o[c], n[c])
             for c in o if c in n and o[c] != n[c]]
    return old.sparkSession.createDataFrame(
        rows, "column_name string, change string, old_type string, "
              "new_type string")


def profile_drift(old: DataFrame | None, new: DataFrame,
                  cols: list[str] | None = None,
                  table_name: str = "table",
                  old_profile: DataFrame | None = None,
                  **kwargs) -> DataFrame:
    """Value-distribution drift between two snapshots: both sides'
    ``profile_table`` reports full-outer-joined on metric_name —
    (table_name, metric_name, old_value, new_value, abs_change,
    rel_change) — the "did the feed silently change under us" monitor
    (null-rate spikes, cardinality collapse, range shifts).  Profiles
    only columns present in BOTH schemas when ``cols`` is omitted.
    ``kwargs`` forward to ``profile_metrics`` — pass
    ``distinct='approx'``/``percentile_mode='approx'`` at scale.

    Cost: one single-aggregate scan per side + a ≤(metrics) row join —
    there is no cheaper shape, both datasets must be read. When the old
    side's profile already exists (a persisted report from the previous
    monitoring run — the normal drift-monitor cadence), pass it as
    ``old_profile`` (the ``profile_table`` long frame, or any frame
    with ``metric_name``/``metric_value``): the old dataset is then
    never re-scanned, halving the cost — ``old`` may then be ``None``
    (the natural monitoring call, ``profile_drift(None, new,
    old_profile=saved)``; ``cols`` is derived from ``new`` alone, so
    the never-rescan-the-old-side path needs no placeholder frame).

    Caveat when passing BOTH ``old`` and ``old_profile``: default
    ``cols`` come from the schemas' intersection, not from what the
    saved report actually covers (metric names are not parseable back
    to columns once dots appear in them) — if the report was built on
    a SUBSET of the old frame's columns, pass that subset as ``cols``
    explicitly or the uncovered columns emit one-sided NULL-old rows."""
    if old is None and old_profile is None:
        raise ValueError("profile_drift needs either the old frame or "
                         "its saved old_profile report")
    if cols is None:
        if old is not None:
            # old frame available (even alongside old_profile): keep
            # the documented both-schemas intersection — a column only
            # `new` has was never baselined and must not emit one-sided
            # NULL-old rows that downstream alerting reads as drift
            o = {f.name for f in old.schema}
            cols = [f.name for f in new.schema if f.name in o]
        else:
            # the old side exists only as its saved report — its live
            # schema is unavailable by design, so profile every column
            # of `new`; metrics the old report lacks surface as NULL
            # old_value rows in the full-outer join below
            cols = [f.name for f in new.schema]
        if not cols:
            raise ValueError("snapshots share no columns to profile")
    po = (old_profile if old_profile is not None
          else profile_table(old, table_name, cols, **kwargs)) \
        .select("metric_name", F.col("metric_value").alias("old_value"))
    pn = profile_table(new, table_name, cols, **kwargs) \
        .select("metric_name", F.col("metric_value").alias("new_value"))
    j = po.join(pn, "metric_name", "full_outer")
    abs_change = F.col("new_value") - F.col("old_value")
    rel = F.when(F.col("old_value") != 0,
                 abs_change / F.abs(F.col("old_value")))
    return j.select(F.lit(table_name).alias("table_name"), "metric_name",
                    "old_value", "new_value",
                    abs_change.alias("abs_change"),
                    F.round(rel, 6).alias("rel_change"))


def partition_stats(df: DataFrame) -> DataFrame:
    """Physical-partition balance report: one row per non-empty
    partition — (partition_id, n_rows) — THE first diagnostic when a
    stage straggles (one hot partition = one slow task; AQE splits skew
    only at shuffle boundaries, not inside a pathological scan or after
    a custom repartition).

    Cost: one partial-aggregated groupBy on ``spark_partition_id()`` —
    each input partition contributes exactly one map-side row, so the
    shuffle is O(partitions), not O(rows).  Summarize driver-side
    (``max(n_rows)/avg`` = skew factor); empty partitions produce no
    row, so compare the row count against
    ``df.rdd.getNumPartitions()``-style expectations separately if you
    need to find THEM.
    """
    return (df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("n_rows")))
