"""catalog.read_meta_rows contract (r12): bounded parameter tables
only, enforced — not just documented. The r11 verdict flagged that one
misuse would pin a corpus in driver memory; the bound is enforced
through a LIMIT read so an oversized table fails after transferring at
most META_ROWS_MAX+1 rows."""

from __future__ import annotations

import pytest

from australia_company_etl_pipeline_spark import catalog


def test_read_meta_rows_small_table_roundtrips_and_caches(
        spark, tmp_path):
    path = str(tmp_path / "meta")
    spark.range(5).selectExpr("id", "id * 2 as v") \
        .coalesce(1).write.parquet(path)
    rows = catalog.read_meta_rows(spark, path)
    assert sorted((r["id"], r["v"]) for r in rows) \
        == [(i, 2 * i) for i in range(5)]
    # second read is served from the file-identity cache
    key = catalog._stat_key(path)
    assert key is not None and key in catalog._ROWS_CACHE
    assert catalog.read_meta_rows(spark, path) is rows


def test_read_meta_rows_oversized_table_raises(spark, tmp_path):
    path = str(tmp_path / "notmeta")
    spark.range(catalog.META_ROWS_MAX + 1).coalesce(1) \
        .write.parquet(path)
    with pytest.raises(ValueError, match="bounded index-parameter"):
        catalog.read_meta_rows(spark, path)
    # a failed read must not poison the cache
    key = catalog._stat_key(path)
    assert key not in catalog._ROWS_CACHE
