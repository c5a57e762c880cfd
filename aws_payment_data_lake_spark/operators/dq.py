"""Declarative data-quality rule engine with a persisted metrics history.

The reference DECLARES this capability without building it: its README
"Potential Upgrades" table lists "Integrate Great Expectations or Deequ"
(README.md:131, Data Quality row) and "Push DQ metrics to dashboards"
(README.md:133, Monitoring row). The engine's audit split + ``reason``
column + ``dq_summary`` (plans/silver.py) cover the declared *outputs*;
this module adds the declarative layer a Deequ user actually works with:

- **Rules are data, not code** — a :class:`Rule` (or plain dict) names a
  column, a kind (``not_null | unique | unique_approx | in_set | range |
  matches | custom_expr | min_rows``) and a pass threshold.
- **One single-pass aggregate** — the whole rule set compiles into ONE
  ``df.agg(...)`` (Deequ's analyzer-fusion design): no per-rule scans.
- **Time-travelable history** — :class:`DQRunner` appends each run's
  per-rule metrics to a txlog table (sources/txlog.py), so DESCRIBE
  HISTORY / VERSION AS OF work on the metrics themselves.
- **Anomaly check** — the newest run is z-scored against the stored
  history per rule (mean ± k·sigma), Deequ's anomaly-detection strategy
  reduced to its useful core.

Scale posture (100 TB): every kind except ``unique`` compiles to a
map-side-combinable conditional count over one scan — the rule set is a
single partial-aggregate pass whose shuffle is one row per partition.
``unique`` needs an exact distinct (one Expand + shuffle on the column);
``unique_approx`` is the scale path — an HLL sketch
(``approx_count_distinct``) that stays map-combinable. Metrics output is
O(#rules), never O(corpus); nothing here collects data rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Iterable, Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

KINDS = ("not_null", "unique", "unique_approx", "in_set", "range",
         "matches", "custom_expr", "min_rows")

#: schema of the metrics frame check() emits and DQRunner persists.
METRICS_DDL = ("dataset string, rule string, kind string, column string, "
               "metric double, threshold double, passed boolean, "
               "rows bigint, run_ts timestamp")


class DQViolationError(ValueError):
    """Raised by :func:`gate` when a blocking rule fails; carries the
    failing metrics rows as ``.failures`` (list of dicts)."""

    def __init__(self, failures: list[dict[str, Any]]):
        self.failures = failures
        lines = ", ".join(
            f"{f['rule']} ({f['kind']} on {f['column'] or '<frame>'}: "
            f"metric={f['metric']:.6f} < threshold={f['threshold']:g})"
            for f in failures)
        super().__init__(f"data-quality gate failed: {lines}")


@dataclass(frozen=True)
class Rule:
    """One declarative check. ``threshold`` is the minimum passing
    metric — for fraction kinds the satisfied-row fraction in [0, 1]
    (default 1.0 = every row), for ``unique``/``unique_approx`` the
    distinct/non-null ratio, for ``min_rows`` an absolute row count.

    ``column`` may be a comma-separated list for composite-key
    ``unique`` checks (compiled to a struct distinct). ``blocking``
    marks rules :func:`gate` treats as fatal; non-blocking rules are
    reported but never raise.
    """

    name: str
    kind: str
    column: str | None = None
    values: tuple = field(default=())    # in_set membership
    lo: float | None = None              # range bounds, inclusive
    hi: float | None = None
    pattern: str | None = None           # matches (Java regex, rlike)
    expr: str | None = None              # custom_expr (boolean SQL)
    threshold: float = 1.0
    blocking: bool = True

    def __post_init__(self):
        if self.kind not in KINDS:
            raise ValueError(f"rule {self.name!r}: unknown kind "
                             f"{self.kind!r} (one of {KINDS})")
        needs_col = self.kind in ("not_null", "unique", "unique_approx",
                                  "in_set", "range", "matches")
        if needs_col and not self.column:
            raise ValueError(f"rule {self.name!r}: kind {self.kind!r} "
                             f"requires a column")
        if self.kind == "custom_expr" and not self.expr:
            raise ValueError(f"rule {self.name!r}: custom_expr requires "
                             f"expr")
        if self.kind == "in_set" and not self.values:
            raise ValueError(f"rule {self.name!r}: in_set requires "
                             f"values")
        if self.kind == "range" and self.lo is None and self.hi is None:
            raise ValueError(f"rule {self.name!r}: range requires lo "
                             f"and/or hi")


def as_rules(rules: Iterable[Rule | Mapping[str, Any]]) -> list[Rule]:
    """Coerce dicts (rules persisted as JSON/YAML config) to Rules."""
    out = []
    for r in rules:
        if isinstance(r, Rule):
            out.append(r)
        else:
            d = dict(r)
            if "values" in d and not isinstance(d["values"], tuple):
                d["values"] = tuple(d["values"])
            out.append(Rule(**d))
    names = [r.name for r in out]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate rule names: {dupes}")
    return out


def _satisfied(rule: Rule) -> F.Column:
    """Boolean 'this row satisfies the rule' predicate (fraction kinds
    only). NULL never satisfies — a null currency fails in_set just as
    it fails not_null — so the indicator coalesces to false."""
    c = F.col(rule.column) if rule.column else None
    if rule.kind == "not_null":
        cond = c.isNotNull()
    elif rule.kind == "in_set":
        cond = c.isin(list(rule.values))
    elif rule.kind == "range":
        cond = F.lit(True)
        if rule.lo is not None:
            cond = cond & (c >= F.lit(rule.lo))
        if rule.hi is not None:
            cond = cond & (c <= F.lit(rule.hi))
    elif rule.kind == "matches":
        cond = c.rlike(rule.pattern)
    elif rule.kind == "custom_expr":
        cond = F.expr(rule.expr)
    else:  # pragma: no cover — dispatch guarded by Rule.__post_init__
        raise AssertionError(rule.kind)
    return F.coalesce(cond.cast("boolean"), F.lit(False))


def _key_col(rule: Rule) -> F.Column:
    """The (possibly composite) column a unique rule counts."""
    parts = [p.strip() for p in rule.column.split(",")]
    return F.struct(*[F.col(p) for p in parts]) if len(parts) > 1 \
        else F.col(parts[0])


def compile_rules(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Compile the whole rule set into ONE single-row aggregate over one
    scan of ``df`` (tests assert the plan has exactly one scan). Output
    columns: ``rows`` plus ``m_<i>`` per rule — counts for fraction
    kinds, distinct counts for unique kinds."""
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("rows")]
    for i, r in enumerate(rules):
        a = f"m_{i}"
        if r.kind == "min_rows":
            continue  # rows covers it
        if r.kind == "unique":
            k = _key_col(r)
            aggs.append(F.count_distinct(k).alias(a))
            aggs.append(F.count(k).alias(f"n_{i}"))
        elif r.kind == "unique_approx":
            k = _key_col(r)
            aggs.append(F.approx_count_distinct(k).alias(a))
            aggs.append(F.count(k).alias(f"n_{i}"))
        else:
            aggs.append(
                F.sum(_satisfied(r).cast("long")).alias(a))
    return df.agg(*aggs)


def check(df: DataFrame, rules: Iterable[Rule | Mapping[str, Any]], *,
          dataset: str = "", run_ts: datetime | None = None) -> DataFrame:
    """Run every rule in one pass; return one metrics row per rule
    (METRICS_DDL schema). The collect is ONE row of O(#rules) scalars —
    driver-bounded by construction."""
    rs = as_rules(rules)
    spark = df.sparkSession
    row = compile_rules(df, rs).collect()[0].asDict()
    total = int(row["rows"])
    ts = run_ts or datetime.now(timezone.utc).replace(tzinfo=None)
    out: list[tuple] = []
    for i, r in enumerate(rs):
        if r.kind == "min_rows":
            metric = float(total)
        elif r.kind in ("unique", "unique_approx"):
            nn = int(row[f"n_{i}"])
            # empty/all-null column is vacuously unique; HLL may
            # over-estimate slightly — cap at 1.0 so the ratio is sane
            metric = min(float(row[f"m_{i}"]) / nn, 1.0) if nn else 1.0
        else:
            sat = int(row[f"m_{i}"] or 0)
            metric = (sat / total) if total else 1.0
        out.append((dataset, r.name, r.kind, r.column, metric,
                    float(r.threshold), metric >= r.threshold, total, ts))
    # Arrow local relation in ONE partition (r13, guide §4/§6): a
    # Python-LIST createDataFrame takes the Python-RDD path — the
    # frame materializes through defaultParallelism Python worker
    # round-trips and every persisted run stages dozens of near-empty
    # tasks and tiny files that each later history read re-opens
    # (measured 2.6 s/write; pandas+Arrow+coalesce(1) is 0.2 s and
    # one file). The frame is O(#rules) rows forever, so one
    # partition is the right layout at any scale.
    import pandas as pd

    pdf = pd.DataFrame(out, columns=[
        "dataset", "rule", "kind", "column", "metric", "threshold",
        "passed", "rows", "run_ts"])
    return spark.createDataFrame(pdf, schema=METRICS_DDL).coalesce(1)


def gate(df: DataFrame, rules: Iterable[Rule | Mapping[str, Any]], *,
         dataset: str = "", runner: "DQRunner | None" = None) -> DataFrame:
    """Pass ``df`` through a rule set: returns ``df`` unchanged when all
    blocking rules pass, raises :class:`DQViolationError` otherwise.
    With ``runner``, the metrics (pass or fail) are persisted first so
    the failed run is part of the history — a gate that dies silently
    leaves no trail to debug."""
    rs = as_rules(rules)
    if runner is not None:
        metrics = runner.run(df, rs, dataset=dataset)
    else:
        metrics = check(df, rs, dataset=dataset)
    blocking = {r.name for r in rs if r.blocking}
    failures = [m.asDict() for m in metrics.collect()
                if not m.passed and m.rule in blocking]
    if failures:
        raise DQViolationError(failures)
    return df


class DQRunner:
    """check() + persistence + anomaly detection over a txlog table.

    The metrics table is an ordinary lakehouse table: appends are ACID
    commits, ``DESCRIBE HISTORY`` shows every run, ``VERSION AS OF``
    reproduces any past dashboard. History grows O(#rules) per run —
    metadata-sized forever.
    """

    def __init__(self, spark: SparkSession, table_path: str, *,
                 k_sigma: float = 3.0, min_history: int = 3):
        from aws_payment_data_lake_spark.sources.txlog import TxnTable
        self.spark = spark
        self.table = TxnTable(spark, table_path)
        self.k_sigma = float(k_sigma)
        self.min_history = int(min_history)

    def run(self, df: DataFrame,
            rules: Iterable[Rule | Mapping[str, Any]], *,
            dataset: str = "", run_ts: datetime | None = None
            ) -> DataFrame:
        """One evaluated + persisted run; returns the metrics frame."""
        metrics = check(df, rules, dataset=dataset, run_ts=run_ts)
        if self.table.exists():
            self.table.append(metrics)
        else:
            self.table.create(metrics)
        return metrics

    def history(self, version: int | None = None) -> DataFrame:
        """All persisted runs — ``version`` time-travels the history
        itself (the metrics table is an ordinary txlog table)."""
        return self.table.snapshot(version)

    def anomalies(self) -> DataFrame:
        """Z-score the NEWEST run per (dataset, rule) against all prior
        runs. A rule is anomalous when it has >= min_history prior
        observations and |metric - mean| > k·sigma (sigma == 0 history
        means any change at all is anomalous). Pure DataFrame plan —
        one shuffle on the rule key, history is metadata-sized."""
        h = self.history()
        latest_ts = h.groupBy("dataset", "rule").agg(
            F.max("run_ts").alias("run_ts"))
        newest = h.join(latest_ts, ["dataset", "rule", "run_ts"])
        prior = h.alias("h").join(
            latest_ts.alias("l"), ["dataset", "rule"]).where(
            F.col("h.run_ts") < F.col("l.run_ts")).select(
            "dataset", "rule", F.col("h.metric").alias("metric"))
        stats = prior.groupBy("dataset", "rule").agg(
            F.avg("metric").alias("hist_mean"),
            F.coalesce(F.stddev_pop("metric"), F.lit(0.0))
            .alias("hist_sigma"),
            F.count(F.lit(1)).alias("hist_n"))
        j = newest.join(stats, ["dataset", "rule"], "left")
        dev = F.abs(F.col("metric") - F.col("hist_mean"))
        # a rule with NO history at all left-joins to NULL stats; the
        # verdict must be a definite False (insufficient history), not
        # a NULL that only behaves like False inside filters
        hist_n = F.coalesce("hist_n", F.lit(0))
        return j.select(
            "dataset", "rule", "kind", "column", "metric", "passed",
            "run_ts", "hist_mean", "hist_sigma",
            hist_n.alias("hist_n"),
            F.when(hist_n < self.min_history, F.lit(False))
            .when(F.col("hist_sigma") > 0,
                  dev > self.k_sigma * F.col("hist_sigma"))
            .otherwise(dev > F.lit(1e-12))
            .alias("anomalous"))


def dq_dashboard(history: DataFrame) -> DataFrame:
    """Gold-layer rollup of the persisted metrics history — the
    reference's "Push DQ metrics to dashboards" Monitoring row
    (README.md:133) on engine primitives: pass rate + metric band per
    (dataset, rule, day). One groupBy over a metadata-sized table."""
    return (history
            .groupBy("dataset", "rule", "kind",
                     F.to_date("run_ts").alias("run_date"))
            .agg(F.count(F.lit(1)).alias("runs"),
                 F.avg(F.col("passed").cast("double"))
                 .alias("pass_rate"),
                 F.avg("metric").alias("metric_mean"),
                 F.min("metric").alias("metric_min"),
                 F.max("metric").alias("metric_max"))
            .orderBy("dataset", "rule", "run_date"))


def payment_rules() -> list[Rule]:
    """The default rule set for the typed (bronze-cast) payments frame —
    one rule per corruption mode the synthetic generator injects
    (plans/generator.py invalid modes 0-3) plus the primary-key check
    the audit split can't express."""
    from aws_payment_data_lake_spark.plans.schemas import (
        CURRENCIES,
        STATUSES,
    )
    return [
        Rule("amount_positive", "custom_expr",
             column="amount", expr="amount IS NOT NULL AND amount > 0",
             threshold=0.97),
        Rule("currency_known", "in_set", column="currency",
             values=tuple(CURRENCIES), threshold=0.97),
        Rule("status_known", "in_set", column="status",
             values=tuple(STATUSES), threshold=0.97),
        Rule("user_present", "matches", column="user_id",
             pattern=r"\S", threshold=0.97),
        Rule("txn_id_unique", "unique", column="txn_id"),
        Rule("has_rows", "min_rows", threshold=1.0),
    ]
