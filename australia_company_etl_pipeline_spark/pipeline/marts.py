"""dbt-layer parity: staging → intermediate → marts (SURVEY §3.3, §7.2 M5).

Each reference dbt model becomes a DataFrame transformation; materialize by
writing the result or registering a temp view. Thresholds default to the
reference's vars (``dbt/dbt_project.yml:44-52``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import functions as fx

FUZZY_MATCH_THRESHOLD = 0.75
HIGH_CONFIDENCE_THRESHOLD = 0.90


def stg_web_companies(raw: DataFrame) -> DataFrame:
    """dbt/models/staging/stg_web_companies.sql:13-69 — trim, SQL-variant
    normalization (regex only, no stopword list), block key, industry CASE,
    500-char preview, validity flags."""
    normalized = F.upper(
        F.regexp_replace(
            F.regexp_replace(F.col("company_name"), r"(?U)[^\w\s]", " "),
            r"\s+", " "))
    low_ind = F.lower(F.col("industry"))
    return (raw
            .filter(F.col("company_name").isNotNull()
                    & (F.length(F.trim(F.col("company_name"))) >= 3))
            .select(
                F.col("url"),
                F.col("domain"),
                F.trim(F.col("company_name")).alias("company_name"),
                normalized.alias("normalized_name"),
                F.lower(F.substring(normalized, 1, 4)).alias("block_key"),
                F.when(low_ind.contains("tech") | low_ind.contains("software"),
                       "Information Technology")
                .when(low_ind.contains("financ") | low_ind.contains("bank"),
                      "Financial Services")
                .when(low_ind.contains("health") | low_ind.contains("medical"),
                      "Healthcare")
                .when(low_ind.contains("retail") | low_ind.contains("shop"),
                      "Retail")
                .when(low_ind.contains("construct") | low_ind.contains("build"),
                      "Construction")
                .when(low_ind.contains("mining"), "Mining & Resources")
                .otherwise(F.col("industry")).alias("industry"),
                F.substring(F.col("raw_text"), 1, 500).alias("text_preview"),
                (F.col("company_name").isNotNull()
                 & (F.length(F.trim(F.col("company_name"))) >= 3)
                 ).alias("is_valid_name"),
                (F.col("url").isNotNull()
                 & F.col("url").startswith("http")).alias("is_valid_url")))


def stg_abr_entities(raw: DataFrame) -> DataFrame:
    """dbt/models/staging/stg_abr_entities.sql:13-79 — SQL-variant
    normalization (suffix regex, not the full stopword list), entity-type
    CASE, status/state/postcode validation, is_valid_abn flag."""
    normalized = F.upper(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("entity_name"),
                                 r"(?i)(PTY|LTD|LIMITED|PROPRIETARY)", ""),
                r"(?U)[^\w\s]", " "),
            r"\s+", " "))
    low_status = F.lower(F.col("entity_status"))
    return (raw
            .filter(F.col("entity_name").isNotNull())
            .select(
                F.col("abn"),
                F.trim(F.col("entity_name")).alias("entity_name"),
                normalized.alias("normalized_name"),
                F.lower(F.substring(normalized, 1, 4)).alias("block_key"),
                fx.clean_entity_type(F.col("entity_type")).alias("entity_type_desc"),
                F.col("entity_type").alias("entity_type_code"),
                F.when(low_status.contains("active"), "Active")
                .when(low_status.contains("cancel"), "Cancelled")
                .otherwise(F.col("entity_status")).alias("entity_status"),
                F.when(F.upper(F.col("state")).isin(*fx.text.VALID_STATES),
                       F.upper(F.col("state"))).alias("state"),
                F.when(F.col("postcode").rlike(r"^\d{4}$"),
                       F.col("postcode")).alias("postcode"),
                F.col("start_date"),
                (F.length(F.regexp_replace(F.col("abn"), r"\D", "")) == 11
                 ).alias("is_valid_abn")))


def int_matched_companies(matches: DataFrame, stg_web: DataFrame,
                          stg_abr: DataFrame,
                          fuzzy_threshold: float = FUZZY_MATCH_THRESHOLD,
                          high_threshold: float = HIGH_CONFIDENCE_THRESHOLD,
                          ) -> DataFrame:
    """dbt/models/intermediate/int_matched_companies.sql — J5 left
    enrichment joins + F21 confidence bucket + A10 completeness."""
    m = matches.filter(F.col("final_score") >= fuzzy_threshold).alias("m")
    wc = stg_web.alias("wc")
    ae = stg_abr.alias("ae")
    return (m
            .join(wc, F.col("m.crawl_url") == F.col("wc.url"), "left")
            .join(ae, F.col("m.abn") == F.col("ae.abn"), "left")
            .select(
                F.col("m.abn").alias("abn"),
                F.col("m.final_score").alias("final_score"),
                F.col("m.fuzzy_score").alias("fuzzy_score"),
                F.col("m.llm_score").alias("llm_score"),
                F.col("m.match_method").alias("match_method"),
                F.col("wc.url").alias("website_url"),
                F.col("wc.domain").alias("domain"),
                F.col("wc.company_name").alias("web_company_name"),
                F.col("wc.industry").alias("web_industry"),
                F.col("ae.entity_name").alias("abr_entity_name"),
                F.col("ae.entity_type_desc").alias("entity_type"),
                F.col("ae.entity_status").alias("entity_status"),
                F.col("ae.state").alias("state"),
                F.col("ae.postcode").alias("postcode"),
                F.col("ae.start_date").alias("start_date"),
                F.when(F.col("m.final_score") >= high_threshold, "High")
                .when(F.col("m.final_score") >= fuzzy_threshold, "Medium")
                .otherwise("Low").alias("match_confidence"),
                ((F.col("wc.url").isNotNull().cast("int")
                  + F.col("wc.industry").isNotNull().cast("int")
                  + F.col("ae.state").isNotNull().cast("int")
                  + F.col("ae.postcode").isNotNull().cast("int")
                  + F.col("ae.start_date").isNotNull().cast("int"))
                 / F.lit(5.0)).alias("completeness_score")))


def dim_companies(int_matched: DataFrame, stg_abr: DataFrame) -> DataFrame:
    """dbt/models/marts/dim_companies.sql — golden record assembly:
    W1 best-match-per-abn (DISTINCT ON with deterministic tie-break),
    J7 anti join for unmatched active ABR rows, U2 union, F22 merge."""
    win = Window.partitionBy("abn").orderBy(
        F.desc("final_score"), F.asc_nulls_last("website_url"))
    best = (int_matched
            .withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .select("abn", "abr_entity_name", "web_company_name",
                    "website_url", "domain", "web_industry", "entity_type",
                    "entity_status", "state", "postcode", "start_date",
                    "final_score", "match_method", "match_confidence",
                    "completeness_score"))

    abr_only = (stg_abr.alias("ae")
                .join(best.select("abn").alias("b"),
                      F.col("ae.abn") == F.col("b.abn"), "left_anti")
                .filter(F.col("ae.entity_status") == "Active")
                .select(
                    F.col("ae.abn").alias("abn"),
                    F.col("ae.entity_name").alias("abr_entity_name"),
                    F.lit(None).cast("string").alias("web_company_name"),
                    F.lit(None).cast("string").alias("website_url"),
                    F.lit(None).cast("string").alias("domain"),
                    F.lit(None).cast("string").alias("web_industry"),
                    F.col("ae.entity_type_desc").alias("entity_type"),
                    F.col("ae.entity_status").alias("entity_status"),
                    F.col("ae.state").alias("state"),
                    F.col("ae.postcode").alias("postcode"),
                    F.col("ae.start_date").alias("start_date"),
                    F.lit(1.0).alias("final_score"),
                    F.lit("abr_only").alias("match_method"),
                    F.lit("High").alias("match_confidence"),
                    ((F.col("ae.state").isNotNull().cast("int")
                      + F.col("ae.postcode").isNotNull().cast("int")
                      + F.col("ae.start_date").isNotNull().cast("int"))
                     / F.lit(3.0)).alias("completeness_score")))

    final = best.unionByName(abr_only)
    return final.select(
        "abn",
        fx.coalesce_merge(F.col("abr_entity_name"),
                          F.col("web_company_name")).alias("canonical_name"),
        fx.differing_or_null(F.col("web_company_name"),
                             F.col("abr_entity_name")).alias("trading_name"),
        "website_url", "domain",
        F.col("web_industry").alias("industry"),
        "entity_type", "entity_status", "state", "postcode",
        F.col("start_date").alias("registration_date"),
        F.when(F.col("web_company_name").isNotNull()
               & F.col("abr_entity_name").isNotNull(), "MERGED")
        .when(F.col("web_company_name").isNotNull(), "WEB_ONLY")
        .otherwise("ABR_ONLY").alias("data_source"),
        F.col("final_score").alias("confidence_score"),
        "match_method", "match_confidence", "completeness_score")


def fct_match_statistics(int_matched: DataFrame, stg_web: DataFrame,
                         stg_abr: DataFrame) -> DataFrame:
    """dbt/models/marts/fct_match_statistics.sql — A5 rollups over three
    inputs, J10 cross join, A7 map aggregate, A9 ratio metrics."""
    web_stats = stg_web.agg(
        F.count(F.lit(1)).alias("total_web_companies"),
        F.count(F.when(F.col("is_valid_name"), 1)).alias("valid_web_companies"),
        F.countDistinct("domain").alias("unique_domains"))
    abr_stats = stg_abr.agg(
        F.count(F.lit(1)).alias("total_abr_entities"),
        F.count(F.when(F.col("is_valid_abn"), 1)).alias("valid_abn_count"),
        F.count(F.when(F.col("entity_status") == "Active", 1)).alias("active_entities"),
        F.countDistinct("state").alias("states_represented"))
    match_stats = int_matched.agg(
        F.count(F.lit(1)).alias("total_matches"),
        F.count(F.when(F.col("match_confidence") == "High", 1)
                ).alias("high_confidence_matches"),
        F.count(F.when(F.col("match_confidence") == "Medium", 1)
                ).alias("medium_confidence_matches"),
        F.count(F.when(F.col("match_method") == "hybrid", 1)
                ).alias("llm_verified_matches"),
        F.round(F.avg("final_score"), 4).alias("avg_match_score"),
        F.round(F.min("final_score"), 4).alias("min_match_score"),
        F.round(F.max("final_score"), 4).alias("max_match_score"),
        F.round(F.avg("completeness_score"), 4).alias("avg_completeness"))
    by_state = (int_matched
                .filter(F.col("state").isNotNull())
                .groupBy("state").agg(F.count(F.lit(1)).alias("match_count"))
                .agg(F.map_from_entries(
                    F.sort_array(F.collect_list(
                        F.struct("state", "match_count")))
                ).alias("matches_by_state")))

    combined = (match_stats.crossJoin(web_stats).crossJoin(abr_stats)
                .crossJoin(by_state))
    return combined.select(
        "total_web_companies", "valid_web_companies", "unique_domains",
        "total_abr_entities", "valid_abn_count", "active_entities",
        "states_represented", "total_matches", "high_confidence_matches",
        "medium_confidence_matches", "llm_verified_matches",
        "avg_match_score", "min_match_score", "max_match_score",
        "avg_completeness",
        F.round(F.col("total_matches")
                / F.when(F.col("total_web_companies") == 0, None)
                .otherwise(F.col("total_web_companies")) * 100, 2
                ).alias("match_rate_percent"),
        F.round(F.col("high_confidence_matches")
                / F.when(F.col("total_matches") == 0, None)
                .otherwise(F.col("total_matches")) * 100, 2
                ).alias("high_confidence_rate_percent"),
        "matches_by_state")
