"""Crawler over raw zones (VERDICT r11 #4).

The Glue crawler's bigger job is schema inference over raw
parquet/CSV zones that the ETL jobs then read by catalog name
(/root/reference/README.md:63,79-80). Pins: crawl() registering a
mixed warehouse (txlog dirs + a bronze-style parquet zone incl.
Hive partitions + a CSV dir it skips), CSV registration refused
without an explicit schema and working with one, cross-OS-process
SELECT on a crawled name, DML refusal with a CONVERT pointer, and
CONVERT TO TXLOG promoting a crawled parquet table in place.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def wh(spark, tmp_path):
    """A mixed warehouse: one txlog table, one flat parquet zone,
    one Hive-partitioned parquet zone, one CSV landing dir."""
    cat = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.sql("CREATE TABLE managed USING txlog AS "
            "SELECT id FROM range(4)")
    w = cat.warehouse
    spark.range(10).selectExpr("id", "id * 2 AS v") \
        .coalesce(1).write.parquet(os.path.join(w, "bronze_zone"))
    spark.range(12).selectExpr("id", "id % 3 AS part") \
        .write.partitionBy("part") \
        .parquet(os.path.join(w, "hive_zone"))
    os.makedirs(os.path.join(w, "csv_landing"))
    with open(os.path.join(w, "csv_landing", "a.csv"), "w") as f:
        f.write("id,name\n1,alpha\n2,beta\n")
    return cat


def test_crawl_registers_parquet_zones_and_skips_csv(spark, wh):
    found = wh.crawl()
    assert sorted(found) == ["bronze_zone", "hive_zone"]
    assert wh.sql("SELECT COUNT(*) AS n FROM bronze_zone"
                  ).collect()[0].n == 10
    # Hive partition columns auto-discover as ordinary columns
    df = wh.sql("SELECT * FROM hive_zone WHERE part = 1")
    assert df.count() == 4 and "part" in df.columns
    # the CSV dir did NOT register
    modes = {r.tableName: r.deleteMode
             for r in wh.sql("SHOW TABLES").collect()}
    assert "csv_landing" not in modes
    assert modes["bronze_zone"] == "external-parquet"
    # idempotent: a second crawl finds nothing new
    assert wh.crawl() == []


def test_csv_needs_explicit_schema(spark, wh):
    with pytest.raises(ValueError, match="schema"):
        wh.register_external("landing",
                             os.path.join(wh.warehouse, "csv_landing"),
                             fmt="csv")
    wh.register_external("landing",
                         os.path.join(wh.warehouse, "csv_landing"),
                         fmt="csv", schema="id bigint, name string")
    rows = wh.sql("SELECT * FROM landing ORDER BY id").collect()
    assert [(r.id, r.name) for r in rows] == [(1, "alpha"),
                                              (2, "beta")]
    assert dict(wh.sql("SELECT * FROM landing").dtypes
                )["id"] == "bigint"


def test_crawled_name_resolves_in_fresh_os_process(spark, wh):
    wh.crawl()
    probe = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from aws_payment_data_lake_spark.session import get_spark
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog
cat = LakehouseCatalog(get_spark("crawl-probe"), warehouse=sys.argv[2])
n = cat.sql("SELECT COUNT(*) FROM bronze_zone").collect()[0][0]
print(json.dumps({"n": n}))
"""
    out = subprocess.run(
        [sys.executable, "-c", probe, REPO, wh.warehouse],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.strip().splitlines()[-1]) == {"n": 10}


def test_dml_on_external_refused_with_convert_pointer(spark, wh):
    wh.crawl()
    with pytest.raises(KeyError, match="CONVERT TO TXLOG"):
        wh.sql("DELETE FROM bronze_zone WHERE id = 1")
    with pytest.raises(KeyError, match="read-only EXTERNAL"):
        wh.sql("INSERT INTO bronze_zone VALUES (99, 0)")


def test_convert_promotes_crawled_parquet_in_place(spark, wh):
    wh.crawl()
    r = {x.metric: x.value for x in
         wh.sql("CONVERT TO TXLOG bronze_zone").collect()}
    assert r["num_rows"] == 10 and r["num_files"] >= 1
    # now transactional: DML works, zero bytes were copied
    wh.sql("DELETE FROM bronze_zone WHERE id >= 8")
    assert wh.sql("SELECT COUNT(*) AS n FROM bronze_zone"
                  ).collect()[0].n == 8
    modes = {r.tableName: r.deleteMode
             for r in wh.sql("SHOW TABLES").collect()}
    assert modes["bronze_zone"] == "cow"
    # the Hive-layout zone refuses CONVERT loudly (dir-encoded values)
    with pytest.raises(Exception, match="[Hh]ive|flatten"):
        wh.sql("CONVERT TO TXLOG hive_zone")
