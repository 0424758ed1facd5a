"""Entity-matching queries over the oracle tables (SURVEY §2.9, FIXTURES §3).

These run the REAL library operators (normalize → block_join → jaccard →
top-1 window → golden-record merge) on company-name analogs derived from
the TPC-H tables, with full DuckDB oracle twins — so the driver's
correctness gate covers the flagship match path itself, not just its
relational skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import functions as fx
from ..catalog import table
from ..functions.abn import ABN_WEIGHTS
from ..functions.text import COMPANY_STOPWORDS
from ..operators.block_join import block_join
from .registry import register

_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in COMPANY_STOPWORDS)

# DuckDB twin of fx.normalize_company_name (F1)
_NORM_SQL = """
array_to_string(
  list_filter(
    regexp_split_to_array(trim(upper(regexp_replace({col}, '[^\\w\\s]', ' ', 'g'))), '\\s+'),
    t -> t != '' AND t NOT IN ({stop})),
  ' ')
""".replace("{stop}", _STOPWORDS_SQL)


def _norm(col: str) -> str:
    return _NORM_SQL.replace("{col}", col).strip()


@register(
    "entity_match_blocking",
    doc="The flagship entity-match kernel (J1 block join + M2 jaccard "
        "scoring + W1 best-match window, entity_match.py:437-628) run on "
        "company-name analogs derived from part: web names are p_name, "
        "register names are p_name + brand tokens. Blocking key: first TWO "
        "normalized tokens — the reference's 4-char prefix (utils.py:164-180) "
        "degenerates on this corpus (~90 distinct prefixes → quadratic "
        "blocks); composite token blocking bounds block size, the property "
        "that matters at 100 TB. Key selectivity is data modeling, not a "
        "constant (SURVEY §4.1).",
    tags=("flagship", "matching"),
    oracle=f"""
WITH web AS (
  SELECT p_partkey AS web_id,
         p_name || ' Pty Ltd' AS company_name,
         {_norm("p_name || ' Pty Ltd'")} AS normalized_name
  FROM part
), register AS (
  SELECT p_partkey + 1000000 AS abn,
         p_name || ' ' || p_brand || ' Holdings' AS entity_name,
         {_norm("p_name || ' ' || p_brand || ' Holdings'")} AS normalized_name
  FROM part
), web_k AS (
  SELECT *, lower(array_to_string(
      list_slice(regexp_split_to_array(normalized_name, '\\s+'), 1, 2), ' '))
      AS block_key FROM web
), reg_k AS (
  SELECT *, lower(array_to_string(
      list_slice(regexp_split_to_array(normalized_name, '\\s+'), 1, 2), ' '))
      AS block_key FROM register
), pairs AS (
  SELECT w.web_id, w.company_name, r.abn, r.entity_name,
         round(
           CAST(len(list_intersect(
             list_distinct(regexp_split_to_array(w.normalized_name, '\\s+')),
             list_distinct(regexp_split_to_array(r.normalized_name, '\\s+')))) AS DOUBLE)
           / len(list_distinct(list_concat(
             regexp_split_to_array(w.normalized_name, '\\s+'),
             regexp_split_to_array(r.normalized_name, '\\s+')))), 6)
           AS fuzzy_score
  FROM web_k w JOIN reg_k r ON w.block_key = r.block_key
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY web_id ORDER BY fuzzy_score DESC, abn ASC) AS rn
  FROM pairs WHERE fuzzy_score >= 0.45
)
SELECT web_id, company_name, abn, entity_name, fuzzy_score
FROM ranked WHERE rn = 1
""",
)
def entity_match_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    web = p.select(
        F.col("p_partkey").alias("web_id"),
        F.concat(F.col("p_name"), F.lit(" Pty Ltd")).alias("company_name"))
    web = web.withColumn(
        "normalized_name", fx.normalize_company_name(F.col("company_name")))
    register = p.select(
        (F.col("p_partkey") + 1000000).alias("abn"),
        F.concat_ws(" ", "p_name", "p_brand", F.lit("Holdings")
                    ).alias("entity_name"))
    register = register.withColumn(
        "normalized_name", fx.normalize_company_name(F.col("entity_name")))
    two_tok = lambda c: F.lower(  # noqa: E731
        F.concat_ws(" ", F.slice(F.split(c, " "), 1, 2)))
    web = web.withColumn("block_key", two_tok(F.col("normalized_name")))
    register = register.withColumn(
        "block_key", two_tok(F.col("normalized_name")))

    # Tokenize each side ONCE before the join (O(rows)); per-pair work is
    # then a single array_intersect. Re-splitting strings per candidate
    # pair would be O(pairs) regex work — the difference between minutes
    # and seconds here, and between feasible and not at 100 TB.
    web = web.withColumn("toks", fx.token_set(F.col("normalized_name")))
    register = register.withColumn(
        "toks", fx.token_set(F.col("normalized_name")))
    # The register side broadcasts, so the pair explosion runs map-side on
    # the web side's partitioning. A small parquet scan arrives as ONE
    # split — spread it so the O(pairs) scoring parallelizes. Gated on the
    # actual split count: a well-split cluster scan passes through.
    from ..session import ensure_min_partitions
    web = ensure_min_partitions(web)

    pairs = block_join(web, register, key="block_key",
                       broadcast_side="right")
    scored = (pairs
              .withColumn("fuzzy_score",
                          F.round(fx.jaccard_token_arrays(
                              F.col("l.toks"), F.col("r.toks")), 6))
              .filter(F.col("fuzzy_score") >= 0.45)
              .select(F.col("l.web_id").alias("web_id"),
                      F.col("l.company_name").alias("company_name"),
                      F.col("r.abn").alias("abn"),
                      F.col("r.entity_name").alias("entity_name"),
                      "fuzzy_score"))
    # Top-1 per web_id as an AGGREGATE, not a global window: max over
    # (score, -abn) structs gets map-side partial aggregation, so the
    # shuffle carries one row per web_id instead of every scored pair.
    # (W1's row_number form stays covered by best_supplier_match /
    # golden_record_merge; same semantics, tie-break abn ASC.)
    best = (scored.groupBy("web_id")
            .agg(F.max(F.struct(
                F.col("fuzzy_score"),
                (-F.col("abn")).alias("neg_abn"),
                F.col("company_name"),
                F.col("entity_name"))).alias("b")))
    return best.select(
        "web_id",
        F.col("b.company_name").alias("company_name"),
        (-F.col("b.neg_abn")).alias("abn"),
        F.col("b.entity_name").alias("entity_name"),
        F.col("b.fuzzy_score").alias("fuzzy_score"))


# ---------------------------------------------------------------------------
# Full match cascade (M5/M6/F20/U1) under the oracle gate: the REAL
# match_companies library path with the jaccard scorer and the
# deterministic LLM stub — both SQL-expressible, so the whole
# high-band / LLM-rescue / weighted-union cascade is value-checked.
#
# Register-name variants tier the fuzzy scores across the bands
# (thresholds 0.72 / 0.60):
#   partkey%3==0 -> exact normalized twin        (j = 1.0,  'fuzzy')
#   partkey%3==1 -> one extra token              (j ~ 0.83, 'fuzzy')
#   partkey%3==2 -> two extra tokens             (j ~ 0.6-0.71, LLM band;
#                   stub llm = 0.3+0.7*j_raw -> final >= 0.72, 'hybrid')
# ---------------------------------------------------------------------------

_STATES_SQL = "['NSW','VIC','QLD','SA','WA','TAS','NT','ACT']"

_CASCADE_CTES = f"""
web AS (
  SELECT p_name AS company_name,
         'https://www.p' || CAST(p_partkey AS VARCHAR) || '.com.au' AS url,
         p_type AS industry,
         {_norm("p_name")} AS normalized_name
  FROM part
), register AS (
  SELECT p_partkey + 1000000 AS abn,
         CASE CAST(p_partkey % 3 AS INT)
           WHEN 0 THEN p_name || ' Pty Ltd'
           WHEN 1 THEN p_name || ' Digital'
           ELSE p_name || ' Digital Media' END AS entity_name,
         {_STATES_SQL}[CAST(p_size % 8 AS INT) + 1] AS state,
         CAST(1000 + p_partkey % 8999 AS VARCHAR) AS postcode,
         strftime(DATE '1990-01-01' + CAST(p_partkey % 10000 AS INT),
                  '%Y-%m-%d') AS start_date,
         {_norm('''CASE CAST(p_partkey % 3 AS INT)
           WHEN 0 THEN p_name || ' Pty Ltd'
           WHEN 1 THEN p_name || ' Digital'
           ELSE p_name || ' Digital Media' END''')} AS normalized_name
  FROM part
), web_k AS (
  SELECT *, lower(array_to_string(
      list_slice(regexp_split_to_array(normalized_name, '\\s+'), 1, 2), ' '))
      AS block_key FROM web
), reg_k AS (
  SELECT *, lower(array_to_string(
      list_slice(regexp_split_to_array(normalized_name, '\\s+'), 1, 2), ' '))
      AS block_key FROM register
), scored AS (
  SELECT w.company_name AS crawl_name, w.url AS crawl_url,
         w.industry AS industry, r.entity_name AS abr_name, r.abn,
         CAST(len(list_intersect(
           list_distinct(regexp_split_to_array(upper(trim(w.normalized_name)), '\\s+')),
           list_distinct(regexp_split_to_array(upper(trim(r.normalized_name)), '\\s+')))) AS DOUBLE)
         / len(list_distinct(list_concat(
           regexp_split_to_array(upper(trim(w.normalized_name)), '\\s+'),
           regexp_split_to_array(upper(trim(r.normalized_name)), '\\s+'))))
           AS fuzzy_score,
         r.state, r.postcode, r.start_date
  FROM web_k w JOIN reg_k r ON w.block_key = r.block_key
), high AS (
  SELECT crawl_name, crawl_url, abr_name, abn, fuzzy_score,
         CAST(NULL AS DOUBLE) AS llm_score, fuzzy_score AS final_score,
         'fuzzy' AS match_method, state, postcode, start_date
  FROM scored WHERE fuzzy_score >= 0.72
), rescued AS (
  SELECT crawl_name, crawl_url, abr_name, abn, fuzzy_score, llm_score,
         round(0.70 * fuzzy_score + 0.30 * llm_score, 6) AS final_score,
         'hybrid' AS match_method, state, postcode, start_date
  FROM (
    SELECT *,
           round(0.3 + 0.7 * (
             CAST(len(list_intersect(
               list_distinct(regexp_split_to_array(upper(crawl_name), '\\s+')),
               list_distinct(regexp_split_to_array(upper(abr_name), '\\s+')))) AS DOUBLE)
             / len(list_distinct(list_concat(
               regexp_split_to_array(upper(crawl_name), '\\s+'),
               regexp_split_to_array(upper(abr_name), '\\s+'))))), 4) AS llm_score
    FROM scored WHERE fuzzy_score >= 0.60 AND fuzzy_score < 0.72
  ) WHERE round(0.70 * fuzzy_score + 0.30 * llm_score, 6) >= 0.72
), unioned AS (
  SELECT * FROM high UNION ALL SELECT * FROM rescued
)
"""


def _cascade_frames(spark: SparkSession, sf_dir: str):
    p = table(spark, sf_dir, "part")
    states = F.array(*[F.lit(s) for s in
                       ["NSW", "VIC", "QLD", "SA", "WA", "TAS", "NT", "ACT"]])
    web = p.select(
        F.col("p_name").alias("company_name"),
        F.concat(F.lit("https://www.p"), F.col("p_partkey").cast("string"),
                 F.lit(".com.au")).alias("url"),
        F.col("p_type").alias("industry"),
        fx.normalize_company_name(F.col("p_name")).alias("normalized_name"))
    entity_name = (
        F.when(F.col("p_partkey") % 3 == 0,
               F.concat(F.col("p_name"), F.lit(" Pty Ltd")))
        .when(F.col("p_partkey") % 3 == 1,
              F.concat(F.col("p_name"), F.lit(" Digital")))
        .otherwise(F.concat(F.col("p_name"), F.lit(" Digital Media"))))
    register = p.select(
        (F.col("p_partkey") + 1000000).alias("abn"),
        entity_name.alias("entity_name"),
        F.element_at(states, (F.col("p_size") % 8 + 1).cast("int"))
         .alias("state"),
        (F.lit(1000) + F.col("p_partkey") % 8999).cast("string")
         .alias("postcode"),
        F.date_format(
            F.date_add(F.lit("1990-01-01").cast("date"),
                       (F.col("p_partkey") % 10000).cast("int")),
            "yyyy-MM-dd").alias("start_date"))
    register = register.withColumn(
        "normalized_name", fx.normalize_company_name(F.col("entity_name")))
    two_tok = lambda c: F.lower(  # noqa: E731
        F.concat_ws(" ", F.slice(F.split(c, " "), 1, 2)))
    web = web.withColumn("block_key", two_tok(F.col("normalized_name")))
    register = register.withColumn(
        "block_key", two_tok(F.col("normalized_name")))
    # spread the probe side (single parquet split otherwise; see
    # entity_match_blocking) before the broadcast-join pair explosion —
    # gated on the actual split count, no-op on a well-split scan
    from ..session import ensure_min_partitions
    return ensure_min_partitions(web), register


def _run_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.match import match_companies

    web, register = _cascade_frames(spark, sf_dir)
    return match_companies(
        web, register, fuzzy_threshold=0.72, use_llm=True,
        llm_threshold_min=0.60, fuzzy_weight=0.70, llm_weight=0.30,
        scorer="jaccard", broadcast_side="right")


@register(
    "match_cascade_best",
    doc="M5/M6/F20/U1/W2 end-to-end: the real match_companies cascade "
        "(block join → jaccard score → band split → distributed stub-LLM "
        "rescore via mapInPandas → weighted union) then top-1 per "
        "crawl_url (best_match_per_key, tie-break abn asc). The stub LLM "
        "is deterministic token arithmetic, so the whole cascade is "
        "value-checked against SQL.",
    tags=("flagship", "matching", "pandas-udf"),
    oracle=f"""
WITH {_CASCADE_CTES},
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY crawl_url ORDER BY final_score DESC, abn ASC) AS rn
  FROM unioned
)
SELECT crawl_name, crawl_url, abr_name, abn, fuzzy_score, llm_score,
       final_score, match_method, state, postcode, start_date
FROM ranked WHERE rn = 1
""",
)
def match_cascade_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.match import best_match_per_key

    return best_match_per_key(
        _run_cascade(spark, sf_dir), key="crawl_url", tie_break="abn")


@register(
    "match_cascade_stats",
    doc="A5-parity rollup over the live cascade output: per match_method "
        "counts and score stats (fct_match_statistics.sql:13-50 analog) — "
        "verifies the hybrid/LLM band is populated and scored correctly.",
    tags=("matching",),
    oracle=f"""
WITH {_CASCADE_CTES}
SELECT match_method,
       COUNT(*) AS n_matches,
       round(AVG(final_score), 6) AS avg_final,
       round(MIN(final_score), 6) AS min_final,
       round(MAX(final_score), 6) AS max_final,
       COUNT(DISTINCT crawl_url) AS n_urls
FROM unioned
GROUP BY match_method
""",
)
def match_cascade_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _run_cascade(spark, sf_dir)
    return m.groupBy("match_method").agg(
        F.count("*").alias("n_matches"),
        F.round(F.avg("final_score"), 6).alias("avg_final"),
        F.round(F.min("final_score"), 6).alias("min_final"),
        F.round(F.max("final_score"), 6).alias("max_final"),
        F.countDistinct("crawl_url").alias("n_urls"))


# ---------------------------------------------------------------------------
# M3/M4 feature vector — fixture pairs derived 1:1 from part (this query
# tests FEATURES, not candidate generation; the block join has its own
# queries). Variants: %3 drives name suffix + raw_text presence, %2 drives
# a name-derived vs unrelated domain, %4 drives entity_type.
# ---------------------------------------------------------------------------

_FULL_STATE_SQL = """CASE state WHEN 'NSW' THEN 'New South Wales'
  WHEN 'VIC' THEN 'Victoria' WHEN 'QLD' THEN 'Queensland'
  WHEN 'SA' THEN 'South Australia' WHEN 'WA' THEN 'Western Australia'
  WHEN 'TAS' THEN 'Tasmania' WHEN 'NT' THEN 'Northern Territory'
  ELSE 'Canberra' END"""

_JACC_RAW_SQL = """
CAST(len(list_intersect(
  list_distinct(regexp_split_to_array(upper(trim(crawl_name)), '\\s+')),
  list_distinct(regexp_split_to_array(upper(trim(abr_name)), '\\s+')))) AS DOUBLE)
/ len(list_distinct(list_concat(
  regexp_split_to_array(upper(trim(crawl_name)), '\\s+'),
  regexp_split_to_array(upper(trim(abr_name)), '\\s+'))))
"""

_STATE_MENTIONED_SQL = """CASE WHEN raw_text IS NULL OR state IS NULL THEN 0.0
  WHEN CASE upper(state)
    WHEN 'NSW' THEN contains(lower(raw_text),'nsw') OR contains(lower(raw_text),'new south wales') OR contains(lower(raw_text),'sydney')
    WHEN 'VIC' THEN contains(lower(raw_text),'vic') OR contains(lower(raw_text),'victoria') OR contains(lower(raw_text),'melbourne')
    WHEN 'QLD' THEN contains(lower(raw_text),'qld') OR contains(lower(raw_text),'queensland') OR contains(lower(raw_text),'brisbane')
    WHEN 'SA' THEN contains(lower(raw_text),'south australia') OR contains(lower(raw_text),'adelaide')
    WHEN 'WA' THEN contains(lower(raw_text),'western australia') OR contains(lower(raw_text),'perth')
    WHEN 'TAS' THEN contains(lower(raw_text),'tasmania') OR contains(lower(raw_text),'hobart')
    WHEN 'NT' THEN contains(lower(raw_text),'northern territory') OR contains(lower(raw_text),'darwin')
    WHEN 'ACT' THEN contains(lower(raw_text),'act') OR contains(lower(raw_text),'canberra') OR contains(lower(raw_text),'australian capital')
    ELSE FALSE END THEN 1.0 ELSE 0.0 END"""


@register(
    "match_feature_vector",
    doc="M3/M4 — the 12-feature pair vector + linear match probability "
        "(feature_engineering.py:33-232,256-289) as ONE native select per "
        "pair (the reference loops rows in Python). Fuzzy features use the "
        "reference's no-rapidfuzz Jaccard fallback (:106-112).",
    tags=("matching", "functions"),
    oracle=f"""
WITH base AS (
  SELECT p_partkey, p_name AS crawl_name,
         p_name || CASE CAST(p_partkey % 3 AS INT)
           WHEN 0 THEN ' Pty Ltd' WHEN 1 THEN ' Digital'
           ELSE ' Digital Media' END AS abr_name,
         {_STATES_SQL}[CAST(p_size % 8 AS INT) + 1] AS state,
         CAST(1000 + p_partkey % 8999 AS VARCHAR) AS postcode,
         ['PRV','PUB','IND','TRT'][CAST(p_partkey % 4 AS INT) + 1]
           AS entity_type,
         CASE WHEN p_partkey % 2 = 0 THEN p_type END AS industry
  FROM part
), derived AS (
  SELECT *,
    CASE WHEN p_partkey % 2 = 0 THEN 'https://www.' ||
      regexp_replace(lower({_norm('crawl_name')}), '[^a-z0-9]', '', 'g')
      || '.com.au'
    ELSE 'https://www.site' || CAST(p_partkey AS VARCHAR) || '.com.au'
    END AS crawl_url,
    CASE CAST(p_partkey % 3 AS INT)
      WHEN 0 THEN 'Our offices in ' || {_FULL_STATE_SQL} || ' AU ' || postcode
      WHEN 1 THEN 'Contact us for more information' END AS raw_text
  FROM base
), feat AS (
  SELECT *,
    CASE WHEN crawl_name IS NULL OR abr_name IS NULL OR crawl_name = ''
              OR abr_name = '' THEN 0.0
         WHEN {_norm('crawl_name')} = {_norm('abr_name')} THEN 1.0
         ELSE 0.0 END AS name_exact_match,
    CASE WHEN crawl_name IS NULL OR abr_name IS NULL OR crawl_name = ''
              OR abr_name = '' THEN 0.0
         ELSE ({_JACC_RAW_SQL}) END AS name_fuzzy_ratio,
    CASE WHEN p_partkey % 2 = 0 THEN
      regexp_replace(lower({_norm('crawl_name')}), '[^a-z0-9]', '', 'g')
      || '.com.au'
    ELSE 'site' || CAST(p_partkey AS VARCHAR) || '.com.au' END AS domain,
    list_filter(regexp_split_to_array(
      lower({_norm('abr_name')}), '\\s+'), t -> t != '') AS norm_parts
  FROM derived
), feat2 AS (
  SELECT *,
    CASE WHEN crawl_url IS NULL OR abr_name IS NULL OR crawl_url = ''
              OR abr_name = '' THEN 0.0
         WHEN len(list_filter(norm_parts,
              t -> len(t) >= 4 AND contains(domain, t))) > 0 THEN 1.0
         ELSE 0.0 END AS domain_contains_name,
    regexp_replace(regexp_replace(domain, '\\.com\\.au$|\\.au$', ''),
                   '[^a-z0-9]', '', 'g') AS domain_clean,
    regexp_replace(array_to_string(norm_parts, ''), '[^a-z0-9]', '', 'g')
      AS name_clean
  FROM feat
), scoredf AS (
  SELECT p_partkey, crawl_name, abr_name, crawl_url,
    name_exact_match, name_exact_match AS normalized_exact,
    name_fuzzy_ratio, name_fuzzy_ratio AS name_token_sort,
    name_fuzzy_ratio AS name_token_set,
    name_fuzzy_ratio AS name_partial_ratio,
    CASE WHEN crawl_url IS NULL OR abr_name IS NULL OR crawl_url = ''
              OR abr_name = '' THEN 0.0
         WHEN domain_clean != '' AND name_clean != ''
              AND domain_clean = name_clean THEN 1.0
         ELSE 0.0 END AS domain_name_match,
    domain_contains_name,
    {_STATE_MENTIONED_SQL} AS state_mentioned,
    CASE WHEN raw_text IS NULL OR postcode IS NULL THEN 0.0
         WHEN contains(raw_text, postcode) THEN 1.0 ELSE 0.0 END
      AS postcode_mentioned,
    CASE WHEN industry IS NOT NULL AND industry != '' THEN 1.0 ELSE 0.0 END
      AS industry_present,
    CASE WHEN entity_type IN ('PRV','PUB','Private Company','Public Company')
         THEN 1.0 ELSE 0.0 END AS is_company
  FROM feat2
)
SELECT *, round(0.30 * name_exact_match + 0.20 * name_token_sort
              + 0.15 * name_token_set + 0.15 * domain_name_match
              + 0.10 * domain_contains_name + 0.05 * state_mentioned
              + 0.05 * postcode_mentioned, 6) AS match_probability
FROM scoredf
""",
)
def match_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.features import with_features

    p = table(spark, sf_dir, "part")
    states = F.array(*[F.lit(s) for s in
                       ["NSW", "VIC", "QLD", "SA", "WA", "TAS", "NT", "ACT"]])
    etypes = F.array(*[F.lit(t) for t in ["PRV", "PUB", "IND", "TRT"]])
    full_state = (
        F.when(F.col("state") == "NSW", F.lit("New South Wales"))
        .when(F.col("state") == "VIC", F.lit("Victoria"))
        .when(F.col("state") == "QLD", F.lit("Queensland"))
        .when(F.col("state") == "SA", F.lit("South Australia"))
        .when(F.col("state") == "WA", F.lit("Western Australia"))
        .when(F.col("state") == "TAS", F.lit("Tasmania"))
        .when(F.col("state") == "NT", F.lit("Northern Territory"))
        .otherwise(F.lit("Canberra")))
    suffix = (F.when(F.col("p_partkey") % 3 == 0, F.lit(" Pty Ltd"))
              .when(F.col("p_partkey") % 3 == 1, F.lit(" Digital"))
              .otherwise(F.lit(" Digital Media")))
    base = p.select(
        "p_partkey",
        F.col("p_name").alias("crawl_name"),
        F.concat(F.col("p_name"), suffix).alias("abr_name"),
        F.element_at(states, (F.col("p_size") % 8 + 1).cast("int"))
         .alias("state"),
        (F.lit(1000) + F.col("p_partkey") % 8999).cast("string")
         .alias("postcode"),
        F.element_at(etypes, (F.col("p_partkey") % 4 + 1).cast("int"))
         .alias("entity_type"),
        F.when(F.col("p_partkey") % 2 == 0, F.col("p_type"))
         .alias("industry"))
    name_slug = F.regexp_replace(
        F.lower(fx.normalize_company_name(F.col("crawl_name"))),
        "[^a-z0-9]", "")
    derived = base.withColumn(
        "crawl_url",
        F.when(F.col("p_partkey") % 2 == 0,
               F.concat(F.lit("https://www."), name_slug, F.lit(".com.au")))
        .otherwise(F.concat(F.lit("https://www.site"),
                            F.col("p_partkey").cast("string"),
                            F.lit(".com.au")))
    ).withColumn(
        "raw_text",
        F.when(F.col("p_partkey") % 3 == 0,
               F.concat(F.lit("Our offices in "), full_state,
                        F.lit(" AU "), F.col("postcode")))
        .when(F.col("p_partkey") % 3 == 1,
              F.lit("Contact us for more information")))
    return with_features(derived).select(
        "p_partkey", "crawl_name", "abr_name", "crawl_url",
        "name_exact_match", "normalized_exact", "name_fuzzy_ratio",
        "name_token_sort", "name_token_set", "name_partial_ratio",
        "domain_name_match", "domain_contains_name", "state_mentioned",
        "postcode_mentioned", "industry_present", "is_company",
        "match_probability")


def _checksum_sql(d: str) -> str:
    terms = [
        f"(CAST(substr({d}, {i + 1}, 1) AS INT){' - 1' if i == 0 else ''}) * {w}"
        for i, w in enumerate(ABN_WEIGHTS)
    ]
    return " + ".join(terms)


def _acn_check_sql(d: str) -> str:
    from ..functions.abn import ACN_WEIGHTS
    s = " + ".join(f"CAST(substr({d}, {i + 1}, 1) AS INT) * {w}"
                   for i, w in enumerate(ACN_WEIGHTS))
    return (f"((10 - ({s}) % 10) % 10 = CAST(substr({d}, 9, 1) AS INT))")


def _tfn_check_sql(d: str) -> str:
    from ..functions.abn import TFN_WEIGHTS
    s = " + ".join(f"CAST(substr({d}, {i + 1}, 1) AS INT) * {w}"
                   for i, w in enumerate(TFN_WEIGHTS))
    return f"(({s}) % 11 = 0)"


@register(
    "abn_validate_format",
    doc="F8/F9/F10 (+r7 ACN/TFN) — mod-89 ABN checksum + formatting as "
        "pure column arithmetic (utils.py:246-300), on 11-digit strings "
        "derived from customer keys; r7 adds the ASIC ACN check digit, "
        "the ATO TFN mod-11 rule and the ACN-embedded-in-ABN extraction, "
        "all the same codegen shape; the oracle recomputes every weighted "
        "sum in SQL.",
    tags=("functions",),
    oracle=f"""
WITH derived AS (
  SELECT c_custkey,
         lpad(CAST((c_custkey * 7919) % 100000000000 AS VARCHAR), 11, '0') AS abn11,
         lpad(CAST((c_custkey * 104729) % 1000000000 AS VARCHAR), 9, '0') AS id9
  FROM customer
)
SELECT c_custkey, abn11, id9,
       (({_checksum_sql('abn11')}) % 89 = 0) AS is_valid,
       substr(abn11,1,2) || ' ' || substr(abn11,3,3) || ' ' ||
       substr(abn11,6,3) || ' ' || substr(abn11,9,3) AS formatted,
       {_acn_check_sql('id9')} AS acn_valid,
       substr(id9,1,3) || ' ' || substr(id9,4,3) || ' ' ||
       substr(id9,7,3) AS acn_formatted,
       {_tfn_check_sql('id9')} AS tfn_valid,
       CASE WHEN ({_checksum_sql('abn11')}) % 89 = 0
            THEN substr(abn11, 3, 9) END AS acn_of_abn
FROM derived
""",
)
def abn_validate_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    derived = c.select(
        "c_custkey",
        F.lpad(((F.col("c_custkey") * 7919) % 100000000000)
               .cast("string"), 11, "0").alias("abn11"),
        F.lpad(((F.col("c_custkey") * 104729) % 1000000000)
               .cast("string"), 9, "0").alias("id9"))
    return derived.select(
        "c_custkey", "abn11", "id9",
        fx.validate_abn(F.col("abn11")).alias("is_valid"),
        fx.format_abn(F.col("abn11")).alias("formatted"),
        fx.validate_acn(F.col("id9")).alias("acn_valid"),
        fx.format_acn(F.col("id9")).alias("acn_formatted"),
        fx.validate_tfn(F.col("id9")).alias("tfn_valid"),
        fx.acn_from_abn(F.col("abn11")).alias("acn_of_abn"))


_DUCK_FMTS = ("%Y%m%d", "%Y-%m-%d", "%-d/%-m/%Y", "%Y/%-m/%-d", "%-d-%-m-%Y")
# Single-format try_strptime keeps the result timezone-naive (the list form
# returns timestamptz, whose DATE cast is session-tz-dependent).
_DUCK_PARSE = "COALESCE(" + ", ".join(
    f"CAST(try_strptime(raw, '{f}') AS DATE)" for f in _DUCK_FMTS) + ")"


@register(
    "date_parse_multi",
    doc="F18/F19 — multi-format date parse cascade (parse_abr.py:219-240, "
        "clean_abr.py:97-99): order dates rendered in the reference's five "
        "formats (plus an unparseable band), re-parsed via try_to_date "
        "coalesce; unparseable → NULL, with a round-trip check column.",
    tags=("functions", "date"),
    oracle=f"""
WITH rendered AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
         CASE CAST(o_orderkey % 6 AS INT)
           WHEN 0 THEN strftime(CAST(o_orderdate AS DATE), '%Y%m%d')
           WHEN 1 THEN strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
           WHEN 2 THEN strftime(CAST(o_orderdate AS DATE), '%-d/%-m/%Y')
           WHEN 3 THEN strftime(CAST(o_orderdate AS DATE), '%Y/%-m/%-d')
           WHEN 4 THEN strftime(CAST(o_orderdate AS DATE), '%-d-%-m-%Y')
           ELSE 'not-a-date' END AS raw
  FROM orders
)
SELECT o_orderkey, raw, strftime({_DUCK_PARSE}, '%Y-%m-%d') AS parsed,
       COALESCE({_DUCK_PARSE} = d, FALSE) AS roundtrip_ok
FROM rendered
""",
)
def date_parse_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    fmt = F.col("o_orderkey") % 6
    raw = (F.when(fmt == 0, F.date_format(d, "yyyyMMdd"))
           .when(fmt == 1, F.date_format(d, "yyyy-MM-dd"))
           .when(fmt == 2, F.date_format(d, "d/M/yyyy"))
           .when(fmt == 3, F.date_format(d, "yyyy/M/d"))
           .when(fmt == 4, F.date_format(d, "d-M-yyyy"))
           .otherwise(F.lit("not-a-date")))
    rendered = o.select("o_orderkey", d.alias("d"), raw.alias("raw"))
    parsed = fx.parse_date_multi(F.col("raw"))
    return rendered.select(
        "o_orderkey", "raw",
        # parquet DATE vs DuckDB datetime64 stringify differently in the
        # driver's hash — surface ISO strings for engine-portable values.
        F.date_format(parsed, "yyyy-MM-dd").alias("parsed"),
        F.coalesce(parsed == F.col("d"), F.lit(False)).alias("roundtrip_ok"))


@register(
    "golden_record_merge",
    doc="F22/J7/U2 — golden-record assembly (dim_companies.sql:37-108): "
        "best order per customer merged with order-less customers tagged "
        "ABR_ONLY-style, with COALESCE field priority.",
    tags=("marts",),
    oracle="""
WITH best AS (
  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
), matched AS (
  SELECT c.c_custkey, c.c_name AS canonical_name, b.o_orderkey AS best_orderkey,
         round(b.o_totalprice, 2) AS total_price, 'MERGED' AS data_source
  FROM customer c JOIN best b ON c.c_custkey = b.o_custkey AND b.rn = 1
), only_dim AS (
  SELECT c.c_custkey, c.c_name AS canonical_name,
         CAST(NULL AS BIGINT) AS best_orderkey,
         CAST(NULL AS DOUBLE) AS total_price, 'DIM_ONLY' AS data_source
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
)
SELECT * FROM matched UNION ALL SELECT * FROM only_dim
""",
)
def golden_record_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    win = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    best = (o.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1))
    matched = (c.join(best, c.c_custkey == best.o_custkey, "inner")
               .select(F.col("c_custkey"),
                       F.col("c_name").alias("canonical_name"),
                       F.col("o_orderkey").alias("best_orderkey"),
                       F.round("o_totalprice", 2).alias("total_price"),
                       F.lit("MERGED").alias("data_source")))
    only_dim = (c.join(o.select("o_custkey"),
                       c.c_custkey == F.col("o_custkey"), "left_anti")
                .select(F.col("c_custkey"),
                        F.col("c_name").alias("canonical_name"),
                        F.lit(None).cast("long").alias("best_orderkey"),
                        F.lit(None).cast("double").alias("total_price"),
                        F.lit("DIM_ONLY").alias("data_source")))
    return matched.unionByName(only_dim)
