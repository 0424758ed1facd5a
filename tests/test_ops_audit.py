"""Ops/audit operators (SURVEY §1.2): run metadata, stage stats,
single-pass DQ, audit-log snapshot diff."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.operators import audit, quality


def _jobs_for(spark, group: str, fn):
    """Run fn() inside a job group; return how many Spark jobs it ran."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_run_assertions_is_one_job(spark):
    t1 = spark.range(100).withColumn("v", F.col("id") % 10)
    t2 = spark.range(50).withColumn("s", F.lit("ok"))
    named = {
        "v_range": t1.filter((F.col("v") < 0) | (F.col("v") > 5)),
        "s_values": t2.filter(~F.col("s").isin("ok")),
        "id_dups": t1.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1),
    }
    out = {}
    # AQE materializes shuffle stages as extra jobs; disable it so "one
    # action" is observable as exactly one job id.
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        njobs = _jobs_for(spark, "dq-one-job",
                          lambda: out.update(quality.run_assertions(named)))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert out == {"v_range": 40, "s_values": 0, "id_dups": 0}
    assert njobs == 1, f"suite must run as one job, ran {njobs}"


def test_row_checks_report_single_scan_counts(spark):
    df = spark.createDataFrame(
        [(1, 0.5, "O"), (2, 1.5, "F"), (3, None, "X"), (4, -0.1, None)],
        "id int, score double, status string")
    rep = quality.row_checks_report(df, {
        "score_range": quality.cond_invalid_score("score"),
        "status_values": quality.cond_not_accepted_values("status",
                                                          ["O", "F"]),
        "status_null": quality.cond_null(["status"]),
    }, table_name="t")
    got = {r.check_name: r.violations for r in rep.collect()}
    assert got == {"score_range": 3, "status_values": 1, "status_null": 1}
    njobs = _jobs_for(spark, "dq-row-checks", rep.collect)
    assert njobs == 1


def test_stage_counts_one_plan(spark):
    stages = {"a": spark.range(10), "b": spark.range(3),
              "c": spark.range(0)}
    rows = {r.stage: r.records for r in audit.stage_counts(stages).collect()}
    assert rows == {"a": 10, "b": 3, "c": 0}


def test_pipeline_run_record_fields(spark):
    stages = {"processed": spark.range(7), "matched": spark.range(4),
              "loaded": spark.range(4), "extra": spark.range(1)}
    row = audit.pipeline_run_record(
        stages, run_id="r-42", pipeline_name="p",
        config={"b": 2, "a": 1}, status="completed",
        started_at="2024-01-01 00:00:00").head()
    assert (row.run_id, row.pipeline_name, row.status) == \
        ("r-42", "p", "completed")
    assert (row.records_processed, row.records_matched,
            row.records_loaded) == (7, 4, 4)
    assert row.error_message is None
    assert json.loads(row.config) == {"a": 1, "b": 2}
    assert list(json.loads(row.config)) == ["a", "b"]      # sorted keys
    assert json.loads(row.stage_counts) == {
        "extra": 1, "loaded": 4, "matched": 4, "processed": 7}
    assert str(row.started_at) == "2024-01-01 00:00:00"
    assert row.completed_at is None


def test_quality_metrics_long_format(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 20.0)], "id int, x double")
    out = audit.quality_metrics(df, "t", {
        "row_count": F.count(F.lit(1)),
        "null_x": F.sum(F.when(F.col("x").isNull(), 1).otherwise(0)),
    }, run_id="r-1")
    got = {r.metric_name: r.metric_value for r in out.collect()}
    assert got == {"row_count": 3.0, "null_x": 1.0}
    assert all(r.run_id == "r-1" and r.table_name == "t"
               for r in out.collect())


def test_audit_log_diff_semantics(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, name string, v int")
    new = spark.createDataFrame(
        [(1, "a", 10),            # unchanged -> no row
         (2, "b2", 20),           # renamed -> UPDATE
         (4, "d", 41),            # v changed -> UPDATE
         (5, "e", 50)],           # new -> INSERT; 3 missing -> DELETE
        "k long, name string, v int")
    out = audit.audit_log_diff(old, new, keys=["k"], table_name="t",
                               changed_by="tester")
    rows = {r.k: r for r in out.collect()}
    assert {k: r.operation for k, r in rows.items()} == {
        2: "UPDATE", 3: "DELETE", 4: "UPDATE", 5: "INSERT"}
    assert rows[5].old_data is None
    assert rows[3].new_data is None
    assert json.loads(rows[2].old_data) == {"k": 2, "name": "b", "v": 20}
    assert json.loads(rows[2].new_data) == {"k": 2, "name": "b2", "v": 20}
    assert all(r.table_name == "t" and r.changed_by == "tester"
               for r in rows.values())


def test_audit_log_diff_null_images(spark):
    """Null field values survive into the JSON image (to_jsonb parity)."""
    old = spark.createDataFrame([(1, None)], "k long, name string")
    new = spark.createDataFrame([(1, "x")], "k long, name string")
    row = audit.audit_log_diff(old, new, keys=["k"],
                               table_name="t").head()
    assert row.operation == "UPDATE"
    assert json.loads(row.old_data) == {"k": 1, "name": None}


def test_source_freshness_rejects_malformed_now(spark):
    """An unparseable `now` used to cast to NULL and fall through to
    'fresh' — it must raise driver-side instead of passing the SLA."""
    import pytest

    df = spark.createDataFrame([("2024-01-01 00:00:00",)], "ts string")
    with pytest.raises(ValueError, match="ISO timestamp"):
        quality.source_freshness(df, "ts", "not-a-timestamp")


def test_source_freshness_thresholds(spark):
    """dbt sources.yml:24-26 parity: warn 24h / error 48h transitions,
    empty source → error, and suite_report integration (a stale partition
    becomes a violation row)."""
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-02 00:00:00",)], "ts string")

    def status(now):
        return quality.source_freshness(df, "ts", now).head().status

    assert status("2024-01-02 12:00:00") == "fresh"   # 12h old
    assert status("2024-01-03 12:00:00") == "warn"    # 36h old
    assert status("2024-01-05 00:00:00") == "error"   # 72h old

    r = quality.source_freshness(df, "ts", "2024-01-02 12:00:00").head()
    assert abs(r.age_hours - 12.0) < 1e-6
    assert str(r.max_ts).startswith("2024-01-02")

    empty = quality.source_freshness(
        df.filter(F.col("ts") == "never"), "ts", "2024-01-02 12:00:00",
        table_name="stale_partition").head()
    assert empty.status == "error" and empty.max_ts is None

    # fold into the assertion suite: non-fresh rows are violations
    stale = quality.source_freshness(df, "ts", "2024-01-05 00:00:00")
    ok = quality.source_freshness(df, "ts", "2024-01-02 12:00:00")
    counts = quality.run_assertions({
        "freshness_stale": stale.filter(F.col("status") != "fresh"),
        "freshness_ok": ok.filter(F.col("status") != "fresh"),
    })
    assert counts == {"freshness_stale": 1, "freshness_ok": 0}


def test_row_checks_and_metrics_hostile_names(spark):
    """Check/metric names carry quotes and backticks — they must pass
    through verbatim (no stack() SQL-string interpolation to break)."""
    df = spark.createDataFrame([(1,), (None,)], "x int")
    name = "bad ' name `q` -- inject"
    rows = {r.check_name: r.violations for r in quality.row_checks_report(
        df, {name: F.col("x").isNull()}).collect()}
    assert rows == {name: 1}
    m = {r.metric_name: r.metric_value for r in audit.quality_metrics(
        df, "t", {name: F.count(F.lit(1))}).collect()}
    assert m == {name: 2.0}


def test_empty_check_dicts_raise_clearly(spark):
    import pytest

    df = spark.range(1)
    with pytest.raises(ValueError, match="at least one"):
        quality.suite_report({})
    with pytest.raises(ValueError, match="at least one"):
        quality.row_checks_report(df, {})
    with pytest.raises(ValueError, match="at least one"):
        audit.stage_counts({})
    with pytest.raises(ValueError, match="at least one"):
        audit.quality_metrics(df, "t", {})
