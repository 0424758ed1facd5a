"""Ops/audit operators (SURVEY §1.2): run metadata, stage stats,
single-pass DQ, audit-log snapshot diff."""

from __future__ import annotations

import json

import pytest

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
    with pytest.raises(ValueError, match="timestamp string"):
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


# ---------------------------------------------------------------- profiler


def _profile_map(df, **kwargs):
    from australia_company_etl_pipeline_spark.operators.profile import (
        profile_table)

    return {r.metric_name: r.metric_value
            for r in profile_table(df, "t", **kwargs).collect()}


def test_profile_table_exact_stats(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "aa", "2024-01-01 00:00:00"),
         (2, 20.0, "bbbb", "2024-01-02 00:00:00"),
         (3, None, "aa", None),
         (4, 40.0, None, "2024-01-04 00:00:00")],
        "id int, v double, s string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    m = _profile_map(df, cols=["v", "s", "ts"])
    assert m["v.null_rate"] == 0.25
    assert m["v.n_distinct"] == 3.0
    assert (m["v.min"], m["v.max"]) == (10.0, 40.0)
    # mean over NON-NULL values only: (10+20+40)/3
    assert round(m["v.mean"], 6) == round(70.0 / 3, 6)
    # exact interpolated percentiles over [10, 20, 40]
    assert m["v.p50"] == 20.0
    assert m["v.p25"] == 15.0
    assert m["v.p75"] == 30.0
    assert m["s.len_min"] == 2.0 and m["s.len_max"] == 4.0
    assert round(m["s.len_mean"], 6) == round(8.0 / 3, 6)
    assert m["ts.null_rate"] == 0.25
    assert m["ts.min_s"] < m["ts.max_s"]
    # 3 non-null distinct timestamps
    assert m["ts.n_distinct"] == 3.0


def test_profile_all_null_column_yields_nulls_not_zero(spark):
    df = spark.createDataFrame([(1, None), (2, None)],
                               "id int, v double")
    m = _profile_map(df, cols=["v"])
    assert m["v.null_rate"] == 1.0
    assert m["v.n_distinct"] == 0.0
    # no non-null values: min/max/mean/percentiles are NULL, not 0
    assert m["v.min"] is None and m["v.max"] is None
    assert m["v.mean"] is None and m["v.p50"] is None


def test_profile_sketch_modes_track_exact(spark):
    """The 100 TB modes (HLL++ distinct, GK percentiles) must land
    within their documented error bounds of the exact stats."""
    df = spark.range(5000).select(
        F.col("id").cast("double").alias("v"),
        (F.col("id") % 997).cast("double").alias("w"))
    exact = _profile_map(df, cols=["v", "w"])
    approx = _profile_map(df, cols=["v", "w"], distinct="approx",
                          rsd=0.02, percentile_mode="approx")
    for c, nd in (("v", 5000), ("w", 997)):
        assert exact[f"{c}.n_distinct"] == nd
        # rsd is one standard deviation; allow 3σ
        assert abs(approx[f"{c}.n_distinct"] - nd) <= 3 * 0.02 * nd
        for p in ("p25", "p50", "p75"):
            rel = abs(approx[f"{c}.{p}"] - exact[f"{c}.{p}"]) \
                / max(exact[f"{c}.{p}"], 1.0)
            assert rel <= 0.02, (c, p, approx[f"{c}.{p}"],
                                 exact[f"{c}.{p}"])


def test_top_values_ranks_ties_and_min_count(spark):
    from australia_company_etl_pipeline_spark.operators.profile import (
        top_values)

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "x"), ("b", "y"),
         ("c", None), (None, "z")], "u string, v string")
    rows = top_values(df, ["u", "v"], k=2).collect()
    got = {(r.column_name, r.rank): (r.value, r.n) for r in rows}
    # u: a=2, b=2 — tie broken by value asc; c=1 pruned by k=2
    assert got[("u", 1)] == ("a", 2)
    assert got[("u", 2)] == ("b", 2)
    # v: x=3 top; y=1/z=1 tie → y first; NULLs never counted
    assert got[("v", 1)] == ("x", 3)
    assert got[("v", 2)] == ("y", 1)
    pruned = top_values(df, ["u", "v"], k=2, min_count=2).collect()
    assert {(r.column_name, r.value) for r in pruned} == {
        ("u", "a"), ("u", "b"), ("v", "x")}


def test_profile_validation_errors(spark):
    import pytest

    from australia_company_etl_pipeline_spark.operators import profile

    df = spark.range(3).withColumn("v", F.col("id") * 1.0)
    with pytest.raises(ValueError, match="not in frame"):
        profile.profile_metrics(df, ["nope"])
    with pytest.raises(ValueError, match="distinct"):
        profile.profile_metrics(df, ["v"], distinct="bogus")
    with pytest.raises(ValueError, match="percentile_mode"):
        profile.profile_metrics(df, ["v"], percentile_mode="bogus")
    with pytest.raises(ValueError, match="at least one"):
        profile.top_values(df, [])
    with pytest.raises(ValueError, match="not in frame"):
        profile.top_values(df, ["nope"])
    with pytest.raises(ValueError, match="k must be"):
        profile.top_values(df, ["v"], k=0)


def test_histogram_bins_and_clamping(spark):
    from australia_company_etl_pipeline_spark.operators.profile import (
        histogram)

    df = spark.createDataFrame([(float(v),) for v in range(100)]
                               + [(None,)], "v double")
    h = {r.bin: (r.bin_lo, r.bin_hi, r.n)
         for r in histogram(df, "v", bins=10).collect()}
    assert len(h) == 10
    # 0..99 over [0, 99]: width 9.9; max value lands in the LAST bin
    assert sum(n for _, _, n in h.values()) == 100  # NULL excluded
    assert h[0][0] == 0.0 and abs(h[9][1] - 99.0) < 1e-9
    # explicit bounds clamp out-of-range values into edge bins
    hc = {r.bin: r.n for r in
          histogram(df, "v", bins=4, lo=20.0, hi=60.0).collect()}
    assert hc[0] == 30  # 0..29 clamp into bin 0
    assert hc[3] == 50  # 50..99 clamp into bin 3
    # constant column degenerates to one bin, not a div-by-zero
    one = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    rows = histogram(one, "v", bins=8).collect()
    assert len(rows) == 1 and rows[0].n == 2
    # all-NULL column: empty histogram with the right schema
    nul = spark.createDataFrame([(None,), (None,)], "v double")
    assert histogram(nul, "v").collect() == []


def test_schema_drift_reports_adds_removes_retypes(spark):
    from australia_company_etl_pipeline_spark.operators.profile import (
        schema_drift)

    old = spark.createDataFrame([], "a int, b string, c double")
    new = spark.createDataFrame([], "a long, b string, d string")
    got = {(r.column_name, r.change): (r.old_type, r.new_type)
           for r in schema_drift(old, new).collect()}
    assert got == {("a", "retyped"): ("int", "bigint"),
                   ("c", "removed"): ("double", None),
                   ("d", "added"): (None, "string")}
    assert schema_drift(old, old).collect() == []


def test_profile_drift_flags_distribution_shift(spark):
    from australia_company_etl_pipeline_spark.operators.profile import (
        profile_drift)

    old = spark.range(100).select((F.col("id") % 10).cast("double")
                                  .alias("v"))
    new = spark.range(100).select(
        F.when(F.col("id") % 4 == 0, None)
        .otherwise((F.col("id") % 10).cast("double") * 2).alias("v"))
    d = {r.metric_name: r for r in profile_drift(old, new).collect()}
    nr = d["v.null_rate"]
    assert nr.old_value == 0.0 and nr.new_value == 0.25
    assert nr.rel_change is None  # old 0 → undefined, not inf
    mx = d["v.max"]
    assert mx.old_value == 9.0 and mx.new_value == 18.0
    assert abs(mx.rel_change - 1.0) < 1e-9
    # common-column autodetect rejects disjoint schemas loudly
    import pytest

    other = spark.range(1).select(F.col("id").alias("zzz"))
    with pytest.raises(ValueError, match="no columns"):
        profile_drift(old, other)


def test_histogram_outliers_and_nan(spark):
    """Review regressions: a far-out outlier must clamp into the edge
    bin (not overflow the ANSI int cast), and a NaN must be excluded
    (not poison max() and collapse the report to one bin)."""
    from australia_company_etl_pipeline_spark.operators.profile import (
        histogram)

    df = spark.createDataFrame([(0.5,), (9.9e99,), (float("-inf"),)],
                               "v double")
    h = {r.bin: r.n for r in
         histogram(df, "v", bins=10, lo=0.0, hi=1.0).collect()}
    assert h == {0: 1, 5: 1, 9: 1}  # -inf → bin 0, outlier → bin 9
    nan = spark.createDataFrame(
        [(float(v),) for v in range(100)] + [(float("nan"),)],
        "v double")
    bins = histogram(nan, "v", bins=10).collect()
    assert len(bins) == 10 and sum(r.n for r in bins) == 100


def test_percentile_labels_keep_distinct_tails(spark):
    import pytest

    from australia_company_etl_pipeline_spark.operators.profile import (
        profile_metrics, top_values)

    df = spark.range(1000).select(F.col("id").cast("double").alias("v"))
    m = profile_metrics(df, ["v"], percentiles=(0.001, 0.005, 0.5))
    assert {"v.p0.1", "v.p0.5", "v.p50"} <= set(m)
    with pytest.raises(ValueError, match="duplicate percentile"):
        profile_metrics(df, ["v"], percentiles=(0.5, 0.5))
    with pytest.raises(ValueError, match="unique"):
        top_values(df, ["v", "v"])


def test_histogram_rejects_inverted_bounds(spark):
    import pytest

    from australia_company_etl_pipeline_spark.operators.profile import (
        histogram)

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="inverted bounds"):
        histogram(df, "v", bins=10, lo=100.0, hi=0.0)


def test_source_freshness_accepts_what_spark_parses(spark):
    """Review regression: the `now` guard must reject only strings the
    ENGINE would NULL-cast — '2024-1-2 12:0:0' fails fromisoformat but
    parses fine in Catalyst, so it must pass."""
    df = spark.createDataFrame([("2024-01-01 00:00:00",)], "ts string")
    r = quality.source_freshness(df, "ts", "2024-1-2 12:0:0").head()
    assert r.status == "warn"  # 36h old


def test_partition_stats_balance_report(spark):
    from australia_company_etl_pipeline_spark.operators.profile import (
        partition_stats)

    df = spark.range(1000).repartition(8)
    rows = partition_stats(df).collect()
    assert sum(r.n_rows for r in rows) == 1000
    assert 1 <= len(rows) <= 8
    # round-robin repartition is balanced: no partition dominates
    assert max(r.n_rows for r in rows) <= 2 * (1000 // len(rows))
    skewed = spark.range(1000).repartition(8, F.lit(1))  # one hot key
    srows = partition_stats(skewed).collect()
    assert max(r.n_rows for r in srows) == 1000  # diagnosis visible


def test_profile_nan_reported_not_poisoning(spark):
    """Review regression: a NaN must surface as nan_rate and be EXCLUDED
    from min/max/mean/percentiles — not poison max/percentiles to NaN
    while silently deflating the decimal mean."""
    import math

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (float("nan"),), (None,)], "v double")
    m = _profile_map(df, cols=["v"])
    assert m["v.null_rate"] == 0.25
    assert m["v.nan_rate"] == 0.25
    assert m["v.max"] == 2.0 and not math.isnan(m["v.max"])
    assert m["v.mean"] == 1.5
    assert m["v.p50"] == 1.5 and not math.isnan(m["v.p50"])


def test_histogram_derived_bounds_ignore_infinities(spark):
    """Review regression: a single inf must not become the derived
    bound (infinite width → one garbage bin); it clamps into the edge
    bin over the finite range instead."""
    from australia_company_etl_pipeline_spark.operators.profile import (
        histogram)

    df = spark.createDataFrame(
        [(0.0,), (50.0,), (100.0,), (float("inf",),)], "v double")
    h = {r.bin: (r.bin_lo, r.bin_hi, r.n)
         for r in histogram(df, "v", bins=4).collect()}
    assert sum(n for _, _, n in h.values()) == 4  # inf still counted
    assert h[3][1] == 100.0  # upper edge is the finite max
    assert h[3][2] == 2      # 100.0 and the clamped inf


def test_profile_inf_excluded_and_reported(spark):
    """±inf must not silently deflate the decimal-accumulated mean (the
    decimal cast NULLs it out of the numerator while count keeps it in
    the denominator): stats cover the finite values, inf surfaces as
    inf_rate like NaN does as nan_rate."""
    df = spark.createDataFrame(
        [(float("inf"),), (2.0,), (4.0,), (float("-inf"),),
         (float("nan"),)], "v double")
    m = _profile_map(df)
    assert m["v.mean"] == 3.0              # finite-only, not 2.0/NULL
    assert m["v.min"] == 2.0 and m["v.max"] == 4.0
    assert m["v.inf_rate"] == 0.4
    assert m["v.nan_rate"] == 0.2


def test_profile_and_histogram_dotted_column_names(spark):
    """A top-level column literally named 'a.b' (legal; common from JSON
    ingests) must profile instead of being parsed as struct access."""
    from australia_company_etl_pipeline_spark.operators.profile import (
        histogram, top_values)

    df = spark.createDataFrame([(1.0,), (2.0,), (2.0,)], ["a.b"])
    m = _profile_map(df, cols=["a.b"])
    assert m["a.b.mean"] == pytest.approx(5 / 3, abs=1e-6)
    assert m["a.b.n_distinct"] == 2.0
    tops = top_values(df, ["a.b"], k=1).collect()
    assert [(r.value, r.n) for r in tops] == [("2.0", 2)]
    bins = histogram(df, "a.b", bins=2).collect()
    assert sum(r.n for r in bins) == 3


def test_histogram_one_sided_inverted_bound_raises(spark):
    """lo=100 over data maxing at 50 previously fabricated a negative
    out-of-range bin via the degenerate-equal-bounds branch; it must
    fail like the both-supplied inverted case."""
    from australia_company_etl_pipeline_spark.operators.profile import (
        histogram)

    df = spark.createDataFrame([(10.0,), (20.0,), (50.0,)], "x double")
    with pytest.raises(ValueError, match="excludes every value"):
        histogram(df, "x", bins=5, lo=100.0)
    with pytest.raises(ValueError, match="excludes every value"):
        histogram(df, "x", bins=5, hi=5.0)


def test_profile_drift_old_profile_reuse(spark):
    """Passing a precomputed old-side profile (yesterday's persisted
    report) must yield the same drift rows as re-profiling the old
    frame, and must not scan the old dataset at all."""
    from australia_company_etl_pipeline_spark.operators.profile import (
        profile_drift, profile_table)

    old = spark.createDataFrame([(float(i),) for i in range(50)],
                                "x double")
    new = spark.createDataFrame([(float(i),) for i in range(25)],
                                "x double")
    base = profile_table(old, "t", ["x"])
    want = {(r.metric_name, r.old_value, r.new_value, r.abs_change)
            for r in profile_drift(old, new, ["x"],
                                   table_name="t").collect()}
    # poison pill: if the old frame were re-profiled, this would throw
    poison = old.select(
        (F.col("x") / F.lit(0)).alias("boom").cast("double").alias("x"))
    got = {(r.metric_name, r.old_value, r.new_value, r.abs_change)
           for r in profile_drift(poison, new, ["x"], table_name="t",
                                  old_profile=base).collect()}
    assert got == want

    # the natural monitoring call needs NO placeholder old frame: with
    # old=None, cols derives from `new` alone (r6 ADVICE fix — the
    # fast path used to dereference old.schema and crash)
    none_got = {(r.metric_name, r.old_value, r.new_value, r.abs_change)
                for r in profile_drift(None, new, table_name="t",
                                       old_profile=base).collect()}
    assert none_got == want

    import pytest

    with pytest.raises(ValueError, match="either the old frame"):
        profile_drift(None, new, table_name="t")


def test_profile_drift_old_frame_keeps_intersection_cols(spark):
    """With the old FRAME present — even alongside old_profile — cols
    default to the both-schemas intersection: a column only `new` has
    was never baselined and must not emit one-sided NULL-old drift rows
    (the false-alarm rule downstream alerting applies)."""
    from australia_company_etl_pipeline_spark.operators.profile import (
        profile_drift,
        profile_table,
    )

    old = spark.createDataFrame([(1, 10.0), (2, 12.0)], "a long, b double")
    new = spark.createDataFrame([(1, 10.0, "x"), (2, 12.5, "y")],
                                "a long, b double, c string")
    saved = profile_table(old, "t", ["a", "b"])

    # old frame given: intersection — no metric row mentions column c
    for call in (profile_drift(old, new),
                 profile_drift(old, new, old_profile=saved)):
        names = [r.metric_name for r in call.collect()]
        assert names and not any(".c." in n or n.startswith("c.")
                                 for n in names), names
    # old frame absent: every `new` column profiles; c's rows carry
    # NULL old_value (the documented saved-report behavior)
    d = profile_drift(None, new, old_profile=saved)
    c_rows = [r for r in d.collect() if ".c." in r.metric_name
              or r.metric_name.startswith("c.")]
    assert c_rows and all(r.old_value is None for r in c_rows)


# --------------------------------------------------- k-anonymity redact

def test_suppress_small_groups_modes(spark):
    from australia_company_etl_pipeline_spark.operators.quality import (
        suppress_small_groups,
    )

    report = spark.createDataFrame(
        [("NSW", "a", 10.0), ("NSW", "b", 20.0), ("NSW", "c", 30.0),
         ("NT", "d", 40.0)],
        "state string, who string, amount double")
    # row-counted mode: NT has 1 row < k=2 -> dropped
    kept = suppress_small_groups(report, ["state"], k=2).collect()
    assert {r.state for r in kept} == {"NSW"} and len(kept) == 3
    assert "__n" not in kept[0].asDict()
    # redact mode: shape preserved, non-group cells NULLed + flagged
    red = {(r.state, r.who, r.amount, r.suppressed)
           for r in suppress_small_groups(report, ["state"], k=2,
                                          mode="redact").collect()}
    assert ("NT", None, None, True) in red
    assert ("NSW", "a", 10.0, False) in red


def test_suppress_small_groups_precomputed_count_and_validation(spark):
    from australia_company_etl_pipeline_spark.operators.quality import (
        suppress_small_groups,
    )

    agg = spark.createDataFrame(
        [("en", 100, 5.0), ("tlh", 2, 9.0), ("und", None, 1.0)],
        "lang string, n_subjects int, metric double")
    kept = {r.lang for r in suppress_small_groups(
        agg, ["lang"], k=5, count_col="n_subjects").collect()}
    assert kept == {"en"}                     # NULL count -> suppressed
    with pytest.raises(ValueError, match="mode"):
        suppress_small_groups(agg, ["lang"], k=5, count_col="n_subjects",
                              mode="hide")
    with pytest.raises(ValueError, match="k must"):
        suppress_small_groups(agg, ["lang"], k=0)
