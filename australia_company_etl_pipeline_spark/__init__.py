"""australia_company_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing capabilities of
the reference entity-resolution ETL pipeline
(medhaparwe/australia-company-etl-pipeline) as idiomatic Spark DataFrame/SQL,
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) such an engine needs at 100 TB.

Design stance (SURVEY.md §7.1):
- every operator is a composable, schema-typed DataFrame transformation
- no driver-side pandas in the data path
- native Catalyst expressions everywhere; Arrow `pandas_udf` only where a
  Python library is genuinely required
- all dbt-layer models are Spark SQL / DataFrame views
"""

__version__ = "0.1.0"
