"""aws_payment_data_lake_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference repo ``al-jpacho/aws-payment-data-lake``
(medallion payments ETL: Raw CSV -> Bronze -> Silver Parquet, plus the
declared-but-absent analytics / audit / DQ surface), extended with the
operators a large-scale training-data pipeline needs (dedup families,
similarity search, text analysis, multimodal column plumbing, streaming).

Design stance (see SURVEY.md §7.0):
  * DataFrame/SQL only — no RDD code; UDF-free core so Catalyst + Tungsten
    whole-stage codegen optimize every plan.
  * Explicit StructType schemas at every ingest boundary (no inferSchema).
  * Ordered transform pipelines (``functools.reduce`` over a list), fixing
    the reference's nondeterministic set-iteration (SURVEY.md §1.5.2).
  * Deterministic everywhere a tie could be broken arbitrarily
    (SURVEY.md §1.5.4) so results are oracle-hashable.
  * Every operator is exposed both as a ``df -> df`` callable and as a
    registered named query with a DuckDB-runnable ANSI-SQL oracle twin.
"""

__version__ = "0.1.0"
