"""Domain-mixture resampling as an oracle-checked query over
`documents`.

Driver-anchored since round 6 via the `text_train_test_split` tagged
union (queries/text.py folds the same resample in as variant='mixture'
— VERDICT r5 #2; the registry stays at exactly 50 slots). This module
keeps the standalone query for the bench and the strict-comparator
pytest (tests/test_mixture.py). The oracle embeds the SAME integer
thresholds the operator computes (both sides call ``_copies_expr``'s
arithmetic with identical literals), so the check is exact, not
statistical.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.operators.mixture import (
    _TWO_60,
    mixture_resample,
)
from aws_payment_data_lake_spark.sources import load

# The demonstrative mixture: drop src4 entirely, downsample src0/src1,
# upsample src2/src3, everything else at 1 epoch.
MIX_WEIGHTS = {"src0": 0.25, "src1": 0.5, "src2": 1.5, "src3": 2.0,
               "src4": 0.0}
_DEFAULT_W = 1.0


def _sql_case() -> tuple[str, str]:
    """(base_case, thr_case) SQL expressions with the exact literals."""
    base_arms, thr_arms = [], []
    for src in sorted(MIX_WEIGHTS):
        w = MIX_WEIGHTS[src]
        base_arms.append(f"WHEN '{src}' THEN {int(math.floor(w))}")
        thr_arms.append(f"WHEN '{src}' THEN {int(round((w % 1.0) * _TWO_60))}")
    dflt_base = int(math.floor(_DEFAULT_W))
    dflt_thr = int(round((_DEFAULT_W % 1.0) * _TWO_60))
    return (f"CASE source {' '.join(base_arms)} ELSE {dflt_base} END",
            f"CASE source {' '.join(thr_arms)} ELSE {dflt_thr} END")


_BASE_CASE, _THR_CASE = _sql_case()

_MIXTURE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 15))
           ::BIGINT AS h,
         {_BASE_CASE} AS base,
         {_THR_CASE} AS thr
  FROM documents),
c AS (SELECT doc_id, source,
             base + CASE WHEN h < thr THEN 1 ELSE 0 END AS n_copies
      FROM d)
SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies,
       CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_idx
FROM c WHERE n_copies > 0
ORDER BY doc_id, copy_idx
"""


def corpus_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source epoch resampling
    (operators/mixture.py): src4 dropped, src0/src1 downsampled at
    0.25/0.5, src2/src3 upsampled at 1.5/2.0 epochs, the rest at 1.
    One row per (kept doc, copy); membership and copy counts are pure
    functions of doc_id, so the mixture is reproducible at any
    partition count and stable as the corpus grows."""
    import pyspark.sql.functions as F

    (docs,) = load(spark, sf_dir, "documents")
    out = mixture_resample(docs, MIX_WEIGHTS, default_weight=_DEFAULT_W)
    return out.select(
        "doc_id", "source",
        F.col("n_copies").cast("long").alias("n_copies"),
        F.col("copy_idx").cast("long").alias("copy_idx"),
    ).orderBy("doc_id", "copy_idx")
