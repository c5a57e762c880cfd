"""SCD Type-2 dimension history: versioned rows with validity intervals.

The reference's lake keeps dimensions as flat latest-only tables; a
payments warehouse needs HISTORY — "what segment was this customer in
when the txn posted" is unanswerable after an in-place update. Slowly
Changing Dimension Type 2 is the standard fix: each key holds a chain of
versions `(attrs, valid_from, valid_to, is_current)`; an update CLOSES
the changed current row and inserts a new current version.

Scale shape: `scd2_apply` touches ONLY the current slice — history rows
(`is_current = false`) pass through WITHOUT the join (a filter split,
not a scan of versions). The one join is current-vs-updates on the
dimension key: dims broadcast while small, shuffle on the key once they
don't; either way cost is O(current + updates), independent of how deep
the version history has grown. (With a transactional format this is the
classic `MERGE INTO ... WHEN MATCHED AND attrs_changed` — this is the
format-agnostic DataFrame equivalent, same posture as plans/upsert.py.)

Determinism contract: `updates` carries AT MOST one row per key (a
snapshot at `as_of` — enforce upstream with plans/bronze.deduplicate);
applying the same snapshot twice is a no-op (change detection is
null-safe attribute equality), so replayed batches are idempotent.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SCD_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(dim: DataFrame, as_of) -> DataFrame:
    """Open a version chain for every row of a flat dimension snapshot."""
    return dim.select(
        "*",
        F.lit(as_of).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"))


def _attrs_changed(attrs: list[str]) -> F.Column:
    # null-safe inequality per attribute: NULL -> value and value -> NULL
    # both count as changes, NULL -> NULL does not
    return ~reduce(lambda a, b: a & b,
                   [F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
                    for c in attrs])


def scd2_apply(history: DataFrame, updates: DataFrame, key: str,
               attrs: list[str], as_of) -> DataFrame:
    """Fold a dimension snapshot into an SCD2 history table.

    Per key: unknown -> new current version; known with changed attrs ->
    close the current row at `as_of` and insert a new current version;
    unchanged -> untouched. Keys absent from `updates` are untouched
    (snapshots are per-batch partial upserts, not full reloads).
    Closed-history rows never enter the join."""
    as_of_col = F.lit(as_of).cast("date")
    closed = history.where(~F.col("is_current"))
    cur = history.where(F.col("is_current")).alias("cur")
    upd = updates.select(key, *attrs).alias("upd")

    j = cur.join(upd, F.col(f"cur.{key}") == F.col(f"upd.{key}"), "full")
    changed = _attrs_changed(attrs)
    known = F.col(f"cur.{key}").isNotNull()
    arriving = F.col(f"upd.{key}").isNotNull()

    # ONE pass over the joined rows: each produces 1 row (unchanged
    # survivor / brand-new version) or 2 (closed-out old + new current),
    # built as a struct array and exploded — a three-way union of
    # filtered branches re-executes the join once per branch (observed:
    # three SortMergeJoins in the physical plan for one logical join).
    out_cols = [key, *attrs, *SCD_COLS]
    keep = F.struct(*[F.col(f"cur.{c}").alias(c) for c in out_cols])
    close_out = F.struct(
        *[F.col(f"cur.{c}").alias(c) for c in [key, *attrs]],
        F.col("cur.valid_from").alias("valid_from"),
        as_of_col.alias("valid_to"),
        F.lit(False).alias("is_current"))
    insert = F.struct(
        *[F.col(f"upd.{c}").alias(c) for c in [key, *attrs]],
        as_of_col.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"))
    rows = (F.when(known & arriving & changed, F.array(close_out, insert))
            .when(known, F.array(keep))
            .otherwise(F.array(insert)))
    return closed.select(*out_cols).unionByName(
        j.select(F.explode(rows).alias("r")).select("r.*"))


def scd2_as_of(history: DataFrame, at) -> DataFrame:
    """Point-in-time dimension view: the version valid at date `at`
    (valid_from <= at < valid_to, open intervals current). A
    partition/predicate-prunable filter — no window, no join."""
    at_col = F.lit(at).cast("date")
    return history.where(
        (F.col("valid_from") <= at_col)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at_col)))
