"""Scalar function library (SURVEY.md §2.8–2.9) — all Column -> Column."""

from .abn import (abn_checksum, acn_from_abn, clean_abn, format_abn,
                  format_acn, validate_abn, validate_acn, validate_tfn)
from .dates import coerce_date, parse_date_multi
from .scoring import (coalesce_merge, completeness, confidence_bucket,
                      differing_or_null, weighted_score)
from .similarity import (jaccard_token_arrays, jaccard_tokens,
                         levenshtein_ratio, token_set, token_sort_ratio,
                         token_sorted)
from .text import (blocking_key, clean_company_name, clean_entity_name,
                   clean_entity_type, clean_industry, clean_postcode,
                   clean_state, clean_status, clean_text,
                   extract_company_from_text, extract_domain,
                   extract_industry_from_text, is_australian_domain,
                   normalize_company_name)

__all__ = [
    "abn_checksum", "acn_from_abn", "clean_abn", "format_abn",
    "format_acn", "validate_abn", "validate_acn", "validate_tfn",
    "coerce_date", "parse_date_multi",
    "coalesce_merge", "completeness", "confidence_bucket",
    "differing_or_null", "weighted_score",
    "jaccard_token_arrays", "jaccard_tokens", "levenshtein_ratio",
    "token_set", "token_sort_ratio", "token_sorted",
    "blocking_key", "clean_company_name", "clean_entity_name",
    "clean_entity_type", "clean_industry", "clean_postcode", "clean_state",
    "clean_status", "clean_text", "extract_company_from_text",
    "extract_domain", "extract_industry_from_text", "is_australian_domain",
    "normalize_company_name",
]
