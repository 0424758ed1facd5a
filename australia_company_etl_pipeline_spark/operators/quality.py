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


def run_assertions(named: dict[str, DataFrame]) -> dict[str, int]:
    """Run a suite; returns {name: violation_count} (all zeros == green)."""
    return {name: df.count() for name, df in named.items()}
