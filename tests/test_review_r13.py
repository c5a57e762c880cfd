"""Round-13 adversarial self-review findings, pinned as regressions.

Scope: the round's new surfaces — the DQ engine (operators/dq.py,
landed in the round's opening session without a review pass), the
shared lexer's consumers, and the TVF token matcher.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from aws_payment_data_lake_spark.operators.dq import (
    DQRunner,
    Rule,
    check,
)


def test_anomalies_first_run_is_false_not_null(spark, tmp_path):
    """Finding 1: a rule with NO prior history left-joins to NULL
    stats, and the anomaly verdict fell through every WHEN branch to
    NULL — which behaves like False inside filters but surfaces as
    None to a collecting consumer. The verdict must be a definite
    False (insufficient history)."""
    runner = DQRunner(spark, str(tmp_path / "m"), min_history=3)
    df = spark.range(10).selectExpr("id", "CAST(id AS STRING) AS tag")
    runner.run(df, [Rule("tag_nn", "not_null", column="tag")],
               dataset="d", run_ts=datetime(2024, 1, 1))
    rows = runner.anomalies().collect()
    assert len(rows) == 1
    assert rows[0]["anomalous"] is False          # not None
    assert rows[0]["hist_n"] == 0


def test_anomalies_fire_only_after_min_history(spark, tmp_path):
    """The min_history guard holds through the NULL fix: two stable
    runs then a wild one with min_history=3 -> still False (only 2
    priors); after a third stable run the same deviation fires."""
    rule = [Rule("amount_pos", "custom_expr", expr="v > 0",
                 threshold=0.5)]
    base = datetime(2024, 1, 1)

    def feed(runner: DQRunner, frac_pos: float, day: int) -> None:
        n_pos = int(100 * frac_pos)
        df = spark.range(100).selectExpr(
            f"CASE WHEN id < {n_pos} THEN 1.0 ELSE -1.0 END AS v")
        runner.run(df, rule, dataset="d",
                   run_ts=base + timedelta(days=day))

    ra = DQRunner(spark, str(tmp_path / "a"), min_history=3,
                  k_sigma=3.0)
    feed(ra, 0.96, 0)
    feed(ra, 0.98, 1)
    feed(ra, 0.50, 2)                   # wild, but only 2 priors
    assert ra.anomalies().collect()[0]["anomalous"] is False
    rb = DQRunner(spark, str(tmp_path / "b"), min_history=3,
                  k_sigma=3.0)
    feed(rb, 0.96, 0)
    feed(rb, 0.98, 1)
    feed(rb, 0.97, 2)
    feed(rb, 0.50, 3)                   # same deviation, 3 STABLE priors
    assert rb.anomalies().collect()[0]["anomalous"] is True


@pytest.fixture()
def lake(spark, tmp_path):
    from aws_payment_data_lake_spark.sources.txsql import (
        LakehouseCatalog,
    )
    return LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))


def test_sql_comments_are_whitespace_to_every_arm(lake):
    """Round-13 addition the lexer made structural: `--` and nested
    `/* */` comments anywhere in a statement are whitespace to the
    verb arms (the old split-based dispatch and raw regexes choked on
    a leading comment), while comment markers inside string literals
    stay content."""
    lake.sql("-- nightly DDL\n"
             "CREATE TABLE c1 /* cols */ (id bigint, tag string) "
             "USING txlog ; -- done")
    lake.sql("/* load */ INSERT INTO c1 VALUES "
             "(1, '-- not a comment'), (2, 'x')")
    lake.sql("UPDATE /* hot path */ c1 SET tag = 'y' "
             "WHERE id = 2 -- only the second")
    rows = {r.id: r.tag for r in
            lake.sql("SELECT id, tag FROM c1 -- read").collect()}
    assert rows == {1: "-- not a comment", 2: "y"}
    # dispatch verbs come from WORD tokens: a leading bracketed
    # comment cannot hide the verb
    got = lake.sql("/* drop it */ DROP TABLE c1")
    assert got.where("metric = 'dropped'").first().value == 1


def test_sql_comment_in_tvf_and_use(lake):
    lake.sql("CREATE DATABASE eng")
    lake.sql("USE eng -- switch")
    lake.sql("CREATE TABLE t2 AS SELECT 7 AS v")       # lands in eng
    assert lake.sql("SELECT v FROM eng.t2").first().v == 7
    n = lake.sql("SELECT COUNT(*) FROM table_files/*c*/('t2')"
                 ).first()[0]
    assert n >= 1
    lake.sql("USE default")


def test_check_metric_exact_fractions(spark):
    """check() fractions are exact counts, not approximations —
    review sanity anchor for the single-pass compilation."""
    df = spark.createDataFrame(
        [(1, "eur"), (2, None), (3, "usd"), (4, "xxx")],
        "id bigint, cur string")
    m = {r.rule: r for r in check(df, [
        Rule("cur_nn", "not_null", column="cur", threshold=0.5),
        Rule("cur_set", "in_set", column="cur",
             values=("eur", "usd"), threshold=0.4),
        Rule("id_uniq", "unique", column="id"),
    ]).collect()}
    assert m["cur_nn"].metric == pytest.approx(0.75)
    assert m["cur_set"].metric == pytest.approx(0.5)
    assert m["id_uniq"].metric == pytest.approx(1.0)
    assert all(v.passed for v in m.values())
