"""Entity-resolution pipeline: clean → match → marts (SURVEY §7.2 M2–M5)."""

from .clean import clean_abr_entities, clean_web_companies, dedup_by_key
from .marts import (dim_companies, fct_match_statistics,
                    int_matched_companies, stg_abr_entities,
                    stg_web_companies)
from .match import (RESULT_COLUMNS, best_match_per_key, match_companies,
                    stub_llm_scorer)

__all__ = [
    "clean_abr_entities", "clean_web_companies", "dedup_by_key",
    "dim_companies", "fct_match_statistics", "int_matched_companies",
    "stg_abr_entities", "stg_web_companies",
    "RESULT_COLUMNS", "best_match_per_key", "match_companies",
    "stub_llm_scorer",
]
