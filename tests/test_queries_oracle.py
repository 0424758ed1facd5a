"""Replicates the driver's correctness gate locally: every registered query
with an oracle must match DuckDB on row-count, schema, and order-insensitive
values at the test scale factor."""

from __future__ import annotations

import pytest

from australia_company_etl_pipeline_spark import plans

from conftest import compare_frames

QUERY_NAMES = sorted(plans.REGISTRY)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = plans.REGISTRY[name]
    df = q.builder(spark, sf_dir)
    assert df is not None
    if q.oracle is None:
        # rows-only check, like the driver's weaker path
        assert df.count() >= 0
        return
    expected = duck.execute(q.oracle).df()
    problems = compare_frames(df, expected)
    assert not problems, f"{name}: {problems}"
