"""Data-quality assertion operators (SURVEY §2.12 Q1–Q4).

Each assertion is a query returning VIOLATION rows — a passing check
returns an empty DataFrame, mirroring dbt test semantics
(``/root/reference/dbt/tests/*.sql``, ``dbt/models/*/schema.yml``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assert_valid_scores(df: DataFrame, col: str = "final_score",
                        lo: float = 0.0, hi: float = 1.0) -> DataFrame:
    """Q1 — score ∈ [lo, hi] and NOT NULL
    (dbt/tests/assert_valid_confidence_scores.sql:3-7)."""
    c = F.col(col)
    return df.filter(c.isNull() | (c < lo) | (c > hi))


def assert_minimum_match_rate(fct: DataFrame, minimum_pct: float = 20.0,
                              col: str = "match_rate_percent") -> DataFrame:
    """Q2 — match rate ≥ N% (dbt/tests/assert_minimum_match_rate.sql:4-10)."""
    return fct.filter(F.col(col) < minimum_pct)


def assert_no_duplicates(df: DataFrame, keys: list[str]) -> DataFrame:
    """Q3/A8 — duplicate keys (dbt/tests/assert_no_duplicate_abns.sql:3-8)."""
    return (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1))


def assert_not_null(df: DataFrame, cols: list[str]) -> DataFrame:
    """Q4 — dbt not_null schema test."""
    cond = F.lit(False)
    for c in cols:
        cond = cond | F.col(c).isNull()
    return df.filter(cond)


def assert_accepted_values(df: DataFrame, col: str,
                           values: list) -> DataFrame:
    """Q4 — dbt accepted_values schema test (nulls pass, as in dbt)."""
    c = F.col(col)
    return df.filter(c.isNotNull() & ~c.isin(*values))


def assert_accepted_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """Q4 — dbt_utils accepted_range (inclusive bounds; nulls pass)."""
    c = F.col(col)
    return df.filter(c.isNotNull() & ((c < lo) | (c > hi)))


def source_freshness(df: DataFrame, ts_col: str, now: str,
                     warn_after_hours: float = 24.0,
                     error_after_hours: float = 48.0,
                     table_name: str = "source") -> DataFrame:
    """dbt source-freshness SLA as an engine operator
    (``/root/reference/dbt/models/staging/sources.yml:24-26``:
    ``warn_after: 24h`` / ``error_after: 48h`` on a loaded_at field).

    One row: (table_name, max_ts, age_hours, status) where status is
    'fresh' | 'warn' (age > warn threshold) | 'error' (age > error
    threshold, or the table is empty / all-NULL — no data is the stalest
    possible state). ``now`` is caller-supplied (ISO timestamp string,
    interpreted in the session time zone): the engine never stamps
    wall-clock into data — the orchestrator owns time, which also keeps
    the operator deterministic under the oracle gate.

    Scale: a single max() aggregate — map-side partials, no data shuffle
    (one row per partition reaches the reducer). Feed
    ``.filter(status != 'fresh')`` into ``suite_report`` to fold the SLA
    into the assertion suite as a violation check.
    """
    # Validate driver-side: an unparseable `now` would cast to NULL,
    # every age comparison would be NULL, and the status would silently
    # fall through to 'fresh' — a malformed input passing the SLA.
    # fromisoformat is the no-job fast path; it is NARROWER than
    # Catalyst's timestamp parser (e.g. '2024-1-1'), so on failure probe
    # the actual engine cast before rejecting — the guard must reject
    # only strings the engine itself would NULL out.
    from datetime import datetime

    try:
        datetime.fromisoformat(str(now))
    except (TypeError, ValueError) as exc:
        probed = (df.sparkSession.range(1)
                  .select(F.lit(str(now)).try_cast("timestamp").alias("t"))
                  .head()["t"])
        if probed is None:
            raise ValueError(
                f"source_freshness: `now` must be a timestamp string the "
                f"engine can parse, got {now!r}") from exc
    now_ts = F.lit(now).cast("timestamp")
    agg = df.agg(F.max(F.col(ts_col).cast("timestamp")).alias("max_ts"))
    age = F.round(
        (now_ts.cast("double") - F.col("max_ts").cast("double")) / 3600.0,
        6)
    return agg.select(
        F.lit(table_name).alias("table_name"),
        "max_ts",
        age.alias("age_hours"),
        F.when(F.col("max_ts").isNull()
               | (age > error_after_hours), "error")
        .when(age > warn_after_hours, "warn")
        .otherwise("fresh").alias("status"))


def suite_report(named: dict[str, DataFrame]) -> DataFrame:
    """The whole suite as ONE plan: a union of 1-row count aggregates →
    (check_name, violations). One action schedules every check's scan
    together instead of N sequential count() jobs."""
    from functools import reduce

    if not named:
        raise ValueError("suite_report needs at least one named check; "
                         "got an empty dict")
    parts = [
        df.agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .select(F.lit(name).alias("check_name"), "violations")
        for name, df in named.items()
    ]
    return reduce(DataFrame.unionByName, parts)


def run_assertions(named: dict[str, DataFrame]) -> dict[str, int]:
    """Run a suite; returns {name: violation_count} (all zeros == green).

    Executes as ONE Spark job (single collect over the unioned count
    aggregates), not one count() job per check."""
    return {r.check_name: r.violations
            for r in suite_report(named).collect()}


def row_checks_report(df: DataFrame, checks: dict[str, Column],
                      table_name: str | None = None) -> DataFrame:
    """Row-level checks over ONE table in ONE scan: each check is a
    violation *condition*; counts come from a single
    ``agg(sum(when(cond,1)))`` pass (map-side partials, no shuffle of
    data rows), unpivoted with ``stack`` to (check_name, violations).

    Use for the common case of many column checks on the same wide
    table — one scan regardless of check count; keep the per-row
    ``assert_*`` operators for violation drill-down.

    Check names are carried as Column literals (positional aliases +
    ``map_from_arrays``/``explode`` unpivot, never interpolated into SQL
    text), so quotes/backticks in a name cannot break parsing or inject.
    """
    if not checks:
        raise ValueError("row_checks_report needs at least one check; "
                         "got an empty dict")
    names = list(checks)
    agg = df.agg(*[
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"__c{i}")
        for i, cond in enumerate(checks.values())
    ])
    out = agg.select(F.explode(F.map_from_arrays(
        F.array(*[F.lit(n) for n in names]),
        F.array(*[F.col(f"__c{i}") for i in range(len(names))]),
    )).alias("check_name", "violations"))
    if table_name is not None:
        out = out.select(F.lit(table_name).alias("table_name"),
                         "check_name", "violations")
    return out


def cond_invalid_score(col: str = "final_score", lo: float = 0.0,
                       hi: float = 1.0) -> Column:
    """Violation condition twin of ``assert_valid_scores``."""
    c = F.col(col)
    return c.isNull() | (c < lo) | (c > hi)


def cond_null(cols: list[str]) -> Column:
    """Violation condition twin of ``assert_not_null``."""
    cond = F.lit(False)
    for c in cols:
        cond = cond | F.col(c).isNull()
    return cond


def cond_not_accepted_values(col: str, values: list) -> Column:
    """Violation condition twin of ``assert_accepted_values``."""
    c = F.col(col)
    return c.isNotNull() & ~c.isin(*values)


def cond_out_of_range(col: str, lo, hi) -> Column:
    """Violation condition twin of ``assert_accepted_range``."""
    c = F.col(col)
    return c.isNotNull() & ((c < lo) | (c > hi))


def suppress_small_groups(report: DataFrame, group_cols: list[str],
                          k: int, count_col: str | None = None,
                          mode: str = "drop"):
    """k-anonymity suppression for published aggregates: a report row
    describing fewer than ``k`` underlying subjects re-identifies them
    (the classic small-cell disclosure every stats office redacts), so
    rows below the threshold either DROP (``mode='drop'``) or survive
    with every non-group column NULLed and a ``suppressed`` flag
    (``mode='redact'`` — the shape-preserving form downstream joins
    prefer).

    ``count_col`` names the report's existing per-group subject count;
    without it the rows themselves are counted per group (one
    partial-agg pass + a broadcastable semi/join back). Group columns
    are never redacted — they are the published dimension; if the
    DIMENSION itself is identifying, generalize it upstream (bucketing,
    truncation), which is a modeling decision this operator cannot
    make for you.

    Scale: with ``count_col`` this is a pure filter/projection; without
    it, one partial-aggregated groupBy on the report's own keys."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if mode not in ("drop", "redact"):
        raise ValueError(f"mode must be 'drop' or 'redact', got {mode!r}")
    if not group_cols:
        raise ValueError("need at least one group column")
    if count_col is None:
        counts = (report.groupBy(*group_cols)
                  .agg(F.count(F.lit(1)).alias("__n")))
        joined = report.join(counts, group_cols)
        n = F.col("__n")
    else:
        joined = report
        n = F.coalesce(F.col(count_col), F.lit(0))
    small = n < k
    if mode == "drop":
        out = joined.filter(~small)
        return out.drop("__n") if count_col is None else out
    keep = set(group_cols)
    cols = [F.col(c) if c in keep
            else F.when(~small, F.col(c)).alias(c)
            for c in report.columns]
    out = joined.select(*cols, small.alias("suppressed"))
    return out
