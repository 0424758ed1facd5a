"""Composable DataFrame operators (joins, dedup, quality, similarity)."""

from .audit import (audit_log_diff, pipeline_run_record, quality_metrics,
                    stage_counts)
from .block_join import block_join, similarity_join
from .quality import (assert_accepted_range, assert_accepted_values,
                      assert_minimum_match_rate, assert_no_duplicates,
                      assert_not_null, assert_valid_scores,
                      row_checks_report, run_assertions, suite_report)

__all__ = [
    "block_join", "similarity_join",
    "assert_accepted_range", "assert_accepted_values",
    "assert_minimum_match_rate", "assert_no_duplicates", "assert_not_null",
    "assert_valid_scores", "run_assertions", "suite_report",
    "row_checks_report",
    "audit_log_diff", "pipeline_run_record", "quality_metrics",
    "stage_counts",
]
