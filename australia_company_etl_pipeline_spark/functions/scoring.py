"""Match scoring / bucketing functions (SURVEY.md §2.8 F20–F23).

All pure column arithmetic — the weighted hybrid score the reference
computes row-by-row in Python (``entity_match.py:195-201,567-569``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Defaults from /root/reference/config/pipeline_config.yaml:59-61.
FUZZY_WEIGHT = 0.7
LLM_WEIGHT = 0.3


def weighted_score(fuzzy: Column, llm: Column,
                   fuzzy_weight: float = FUZZY_WEIGHT,
                   llm_weight: float = LLM_WEIGHT) -> Column:
    """F20 — final = w1·fuzzy + w2·llm; llm NULL → pure fuzzy score
    (reference keeps fuzzy_score as final when no LLM, entity_match.py:520)."""
    hybrid = fuzzy * fuzzy_weight + llm * llm_weight
    return F.when(llm.isNull(), fuzzy).otherwise(hybrid)


def confidence_bucket(score: Column) -> Column:
    """F21 — High ≥0.90 / Medium ≥0.75 / Low.

    Reference: dbt/models/intermediate/int_matched_companies.sql:46-50.
    """
    return (F.when(score >= 0.90, "High")
            .when(score >= 0.75, "Medium")
            .otherwise("Low"))


def completeness(cols: list[Column]) -> Column:
    """A10 — fraction of non-null fields.

    Reference: dbt/models/intermediate/int_matched_companies.sql:53-59.
    """
    flags = [c.isNotNull().cast("int") for c in cols]
    total = flags[0]
    for f_ in flags[1:]:
        total = total + f_
    return F.round(total / F.lit(float(len(cols))), 4)


def coalesce_merge(primary: Column, secondary: Column) -> Column:
    """F22 — field-priority merge. Reference dim_companies.sql:69-108."""
    return F.coalesce(primary, secondary)


def differing_or_null(candidate: Column, reference_col: Column) -> Column:
    """F22 trading-name rule: keep candidate only when it differs
    (dim_companies.sql:76-80, upsert_logic.py:129-135)."""
    return F.when(candidate != reference_col, candidate)
