"""Named-query registry: every engine operator as (Spark callable, SQL oracle).

Each operator from SURVEY.md §2 (and each extension operator) registers a
``QuerySpec``: a ``(spark, sf_dir) -> DataFrame`` callable plus an
equivalent ANSI-SQL string DuckDB can run over the same parquet tables.
The driver hash-compares the two at sf0.01 — this registry IS the
correctness surface (__spark_entry__.py just re-exports it).

Rules every registered query follows:
  * every computed column is aliased identically in Spark and SQL;
  * floating-point aggregates are rounded on BOTH sides (doubles summed in
    different orders differ in the last ulps — rounding makes the hash
    stable; SURVEY.md §7.5);
  * all orderings/tiebreaks that PICK rows (top-k, limits, window
    ranks) are total — no nondeterministic row choice. A final
    cosmetic sort of the whole output is NOT required (the driver
    compare canonically sorts rows) and is omitted on large results:
    Spark's range partitioner samples the child plan to pick bounds,
    so a trailing orderBy re-executes the entire lineage a second
    time (~2x on expensive queries, measured round 6);
  * oracle=None only for genuinely non-SQL-expressible ops (streaming
    state, iterative algorithms) — the driver then records a weaker
    rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                    doc=doc or (fn.__doc__ or "").strip(),
                                    tags=tuple(tags))
        return fn

    return deco


def _import_all() -> None:
    # Import for side-effect registration; keep this list in sync with the
    # modules under aws_payment_data_lake_spark/queries/.
    from aws_payment_data_lake_spark.queries import (  # noqa: F401
        curation,
        dedup,
        events_analytics,
        jsonl_source,
        medallion,
        multimodal,
        relational,
        relational2,
        similarity,
        sql_surface,
        stats,
        streaming_batch,
        text,
        udtf_gallery,
    )


def all_queries() -> dict[str, QuerySpec]:
    _import_all()
    return dict(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {n: s.oracle for n, s in all_queries().items() if s.oracle is not None}
