"""Property/fuzz coverage for the SQL micro-parser (VERDICT r11
stretch #7's test half): statements whose string literals contain
every token the per-verb parsing keys on — commas, parens, WHERE/
WHEN/AND keywords, quotes (doubled and backslash-escaped), dots and
table names — must parse to the SAME result as their plain twins.
The quote/paren-aware helpers (_quote_spans, _split_top,
_scan_parens, _find/_search/_sub_outside_quotes) are one shared
layer; this module hammers them through the public sql() surface.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog

# characters that look like SQL structure when they leak out of a
# literal: parser keywords, delimiters, nesting, escapes, and the
# registered table name itself
_NASTY = st.lists(
    st.sampled_from(list("abc,()'= .\\")
                    + ["WHERE", "WHEN", "AND", "THEN",
                       "VALUES", "SELECT", "fz", "fz.t"]),
    min_size=0, max_size=8).map("".join)


def _lit(s: str) -> str:
    """Escape into a Spark single-quoted literal (doubled quotes +
    doubled backslashes)."""
    return s.replace("\\", "\\\\").replace("'", "''")


@pytest.fixture(scope="module")
def cat(spark, tmp_path_factory):
    c = LakehouseCatalog(
        spark, warehouse=str(tmp_path_factory.mktemp("fuzzwh")))
    c.sql("CREATE TABLE fz USING txlog AS "
          "SELECT id, CAST(id AS STRING) AS tag, id * 2 AS v "
          "FROM range(20)")
    return c


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(payload=_NASTY)
def test_update_set_literal_is_content(cat, payload):
    lit = _lit(payload)
    r = cat.sql(f"UPDATE fz SET tag = '{lit}' WHERE id = 3")
    assert {x.metric: x.value for x in r.collect()}["rows_changed"] == 1
    got = cat.sql("SELECT tag FROM fz WHERE id = 3").collect()[0].tag
    assert got == payload


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(payload=_NASTY)
def test_insert_values_literal_is_content(cat, payload):
    lit = _lit(payload)
    cat.sql(f"INSERT INTO fz VALUES (1000, '{lit}', 0)")
    got = cat.sql("SELECT tag FROM fz WHERE id = 1000"
                  ).collect()[0].tag
    assert got == payload
    cat.sql("DELETE FROM fz WHERE id = 1000")


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(payload=_NASTY)
def test_merge_condition_literals_are_content(cat, payload):
    lit = _lit(payload)
    # the literal rides a MATCHED condition AND an INSERT VALUES slot
    r = cat.sql(
        f"MERGE INTO fz AS t USING "
        f"(SELECT 2 AS id, '{lit}' AS tag, 9 AS v) AS s "
        f"ON t.id = s.id "
        f"WHEN MATCHED AND s.tag = '{lit}' THEN UPDATE SET "
        f"tag = s.tag "
        f"WHEN NOT MATCHED THEN INSERT (id, tag, v) "
        f"VALUES (s.id, '{lit}', s.v)")
    assert r.count() > 0
    got = cat.sql("SELECT tag FROM fz WHERE id = 2").collect()[0].tag
    assert got == payload


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(payload=_NASTY)
def test_select_literal_never_binds_or_rewrites(cat, payload):
    """A literal that happens to contain a registered table name (the
    strategy includes 'fz' and 'fz.t') must come back VERBATIM."""
    lit = _lit(payload)
    row = cat.sql(f"SELECT '{lit}' AS tag, COUNT(*) AS n FROM fz "
                  f"GROUP BY 1").collect()[0]
    assert row.tag == payload and row.n == 20


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(payload=_NASTY)
def test_tblproperties_values_are_content(cat, payload):
    if "'" in payload or "\\" in payload:
        payload = payload.replace("'", "").replace("\\", "")
    if not payload:
        payload = "x"
    cat.sql(f"ALTER TABLE fz SET TBLPROPERTIES ('k' = '{payload}')")
    props = {r.key: r.value
             for r in cat.sql("SHOW TBLPROPERTIES fz").collect()}
    assert props["k"] == payload
