"""Regression tests for the round-12 VERDICT contract wrinkle:

`CREATE TABLE t AS SELECT ...` WITHOUT `USING txlog` was rejected
("unsupported CREATE TABLE shape") after the r11 dispatch fix narrowed
CREATE routing to `CREATE [OR REPLACE] TABLE\\b` — which claims bare
CTAS but then refused to serve it. The contract now matches Delta's
default-format semantics: a bare CTAS (and bare column-DDL CREATE)
defaults to the lakehouse txlog format; a non-txlog USING is refused
with a pointer; TEMP VIEW and other session CREATE shapes still fall
through to spark.sql untouched.
"""

from __future__ import annotations

import pytest

from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))


def test_bare_ctas_defaults_to_txlog(spark, cat):
    cat.sql("CREATE TABLE bare_ctas AS "
            "SELECT id, id * 2 AS v FROM range(7)")
    # it is a real lakehouse table: history + time travel work
    assert cat.sql("SELECT COUNT(*) AS n FROM bare_ctas"
                   ).collect()[0].n == 7
    hist = cat.sql("DESCRIBE HISTORY bare_ctas").collect()
    assert len(hist) >= 1
    # and it shows in the catalog
    names = [r.tableName for r in cat.sql("SHOW TABLES").collect()]
    assert "bare_ctas" in names


def test_bare_create_or_replace_ctas(spark, cat):
    cat.sql("CREATE TABLE bare_ror AS SELECT id FROM range(5)")
    cat.sql("CREATE OR REPLACE TABLE bare_ror AS "
            "SELECT id FROM range(3)")
    assert cat.sql("SELECT COUNT(*) AS n FROM bare_ror"
                   ).collect()[0].n == 3
    # REPLACE preserved history: version 0 still readable
    v0 = cat.sql("SELECT COUNT(*) AS n FROM bare_ror "
                 "VERSION AS OF 0").collect()[0].n
    assert v0 == 5


def test_bare_ctas_with_partitioning(spark, cat):
    cat.sql("CREATE TABLE bare_part PARTITIONED BY (p) AS "
            "SELECT id, id % 2 AS p FROM range(10)")
    assert cat.sql("SELECT COUNT(*) AS n FROM bare_part "
                   "WHERE p = 1").collect()[0].n == 5


def test_bare_column_ddl_defaults_to_txlog(spark, cat):
    cat.sql("CREATE TABLE bare_ddl (id bigint NOT NULL, v string)")
    cat.sql("INSERT INTO bare_ddl VALUES (1, 'a'), (2, 'b')")
    assert cat.sql("SELECT COUNT(*) AS n FROM bare_ddl"
                   ).collect()[0].n == 2
    with pytest.raises(Exception, match="(?i)not null|null"):
        cat.sql("INSERT INTO bare_ddl VALUES (NULL, 'x')")


def test_non_txlog_using_refused_with_pointer(spark, cat):
    with pytest.raises(ValueError, match="USING txlog"):
        cat.sql("CREATE TABLE notours USING parquet AS "
                "SELECT id FROM range(3)")
    with pytest.raises(ValueError, match="USING txlog"):
        cat.sql("CREATE TABLE notours (id bigint) USING csv")


def test_temp_view_shapes_still_fall_through(spark, cat):
    """The r11 fix must survive: session CREATE shapes are not ours."""
    cat.sql("CREATE TABLE ft AS SELECT id FROM range(6)")
    cat.sql("CREATE OR REPLACE TEMP VIEW ft_small AS "
            "SELECT * FROM ft WHERE id < 2")
    assert cat.sql("SELECT COUNT(*) AS n FROM ft_small"
                   ).collect()[0].n == 2
    spark.catalog.dropTempView("ft_small")


def test_explicit_using_txlog_unchanged(spark, cat):
    """The old explicit form keeps working identically."""
    cat.sql("CREATE TABLE exp_t USING txlog AS SELECT id FROM range(4)")
    assert cat.sql("SELECT COUNT(*) AS n FROM exp_t").collect()[0].n == 4
