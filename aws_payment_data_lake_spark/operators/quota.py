"""Per-source quota caps — the RefinedWeb/C4 curation shape: keep at
most N documents per source (domain), preferring higher-quality ones.

Semantics (deterministic, engine-independent): within each source rank
docs by (score DESC, doc_id ASC) and keep rank <= cap. The naive plan
is one row_number window partitioned by source — a single task per
source, which at 100 TB means one executor sorting a dominant domain's
entire slice. This module implements the same contract WITHOUT the
corpus-wide window:

  1. one map-side-combinable aggregate: per-(source, score) doc counts;
  2. a window over that AGGREGATE (rows ∝ distinct scores per source,
     not docs) finds each source's cutoff score t and how many of the
     docs AT t still fit;
  3. docs with score > t are kept with NO window at all; only the tie
     group (score == t, one score value per source) is ranked by
     doc_id — a window whose partitions are the tie groups only.

Worst case (every doc in a source shares one score) degrades to the
naive shape; the typical case replaces the corpus-wide sort with a
tiny aggregate window plus a tie-group window. The oracle formulation
in queries/text.py uses the naive row_number — the driver hash match
certifies the two plans compute identical keep decisions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def source_quota_cap(docs: DataFrame, caps: dict[str, int],
                     default_cap: int,
                     score: Column | None = None) -> DataFrame:
    """(doc_id, source, score, cap, band, kept): at most ``cap`` docs
    kept per source, preferring high ``score`` (default: whitespace
    token count), doc_id ascending as the tiebreak. ``band`` names the
    decision mechanism: 'above' (score strictly above the cutoff —
    kept windowlessly), 'tie' (at the cutoff, kept by doc_id rank),
    'below'/'over' (dropped: under the cutoff / past the cap within
    the tie group). ``caps`` is a bounded driver literal (one entry
    per known source); unlisted sources get ``default_cap``."""
    if score is None:
        score = F.size(F.split("text", " ")).cast("long")
    cap = F.lit(default_cap)
    for src in sorted(caps):
        cap = F.when(F.col("source") == src, F.lit(int(caps[src]))) \
               .otherwise(cap)

    d = docs.select("doc_id", "source", score.alias("score"),
                    cap.cast("long").alias("cap"))

    # per-(source, score) histogram — map-side combinable, rows bounded
    # by distinct scores, not docs
    hist = d.groupBy("source", "cap", "score").agg(
        F.count(F.lit(1)).alias("n"))
    wh = (Window.partitionBy("source").orderBy(F.col("score").desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    cum = hist.withColumn(
        "before", F.coalesce(F.sum("n").over(wh), F.lit(0)))
    # cutoff row per source: the score where the cap lands. Sources
    # whose total count <= cap have NO cutoff row — every doc is 'above'.
    cut = (cum.where((F.col("before") < F.col("cap"))
                     & (F.col("before") + F.col("n") > F.col("cap")))
           .select("source", F.col("score").alias("cut_score"),
                   (F.col("cap") - F.col("before")).alias("tie_keep")))
    # a source can also land EXACTLY on a score boundary (before == cap
    # at the next score): then there is no partial score; docs at
    # score >= the last fully-kept score are 'above'. Derive the strict
    # lower bound: the smallest fully-kept score per source.
    full = (cum.where(F.col("before") + F.col("n") <= F.col("cap"))
            .groupBy("source").agg(F.min("score").alias("min_full")))

    j = (d.join(F.broadcast(cut), "source", "left")
         .join(F.broadcast(full), "source", "left"))

    above = (F.col("cut_score").isNull() & F.col("min_full").isNotNull()
             & (F.col("score") >= F.col("min_full"))) | \
            (F.col("cut_score").isNotNull()
             & (F.col("score") > F.col("cut_score")))
    is_tie_group = (F.col("cut_score").isNotNull()
                    & (F.col("score") == F.col("cut_score")))

    # rank ONLY the tie groups (one score value per source) by doc_id
    wt = Window.partitionBy("source").orderBy("doc_id")
    ties = (j.where(is_tie_group)
            .withColumn("tie_rk", F.row_number().over(wt))
            .withColumn("band",
                        F.when(F.col("tie_rk") <= F.col("tie_keep"),
                               F.lit("tie")).otherwise(F.lit("over"))))
    rest = j.where(~is_tie_group).withColumn(
        "band", F.when(above, F.lit("above")).otherwise(F.lit("below")))

    out_cols = ["doc_id", "source", "score", "cap", "band"]
    return (ties.select(*out_cols).unionByName(rest.select(*out_cols))
            .withColumn("kept", F.col("band").isin("above", "tie")))
