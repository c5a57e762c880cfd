"""Small-file compaction: file-count reduction, content preservation,
idempotent re-run, and the local-path guard."""

from __future__ import annotations

import glob
import os

import pytest

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.sources import load
from aws_payment_data_lake_spark.sources.maintenance import (
    compact_parquet_dir,
)


def _n_files(path):
    return len(glob.glob(os.path.join(path, "*.parquet")))


def test_compacts_small_files_preserving_rows(spark, tmp_path):
    (events,) = load(spark, SF_DIR, "events")
    src = str(tmp_path / "zone")
    events.repartition(48).write.parquet(src)
    assert _n_files(src) == 48
    before = sorted(tuple(r) for r in spark.read.parquet(src).collect())

    total = sum(os.path.getsize(f)
                for f in glob.glob(os.path.join(src, "*.parquet")))
    report = compact_parquet_dir(spark, src,
                                 target_file_bytes=-(-total // 4))
    assert report["compacted"] and report["files_before"] == 48
    assert report["files_after"] <= 5
    assert _n_files(src) == report["files_after"]
    # no leftover tmp/bak dirs
    assert not os.path.exists(src + ".compact-tmp")
    assert not os.path.exists(src + ".compact-bak")

    after = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    assert after == before

    # repeated runs strictly shrink the file count until no-op (at toy
    # sizes parquet per-file overhead dominates, so re-encoding can
    # legitimately leave room for another pass; convergence is the
    # guaranteed property)
    prev = report["files_after"]
    for _ in range(5):
        r = compact_parquet_dir(spark, src,
                                target_file_bytes=-(-total // 4))
        if not r["compacted"]:
            break
        assert r["files_after"] < prev
        prev = r["files_after"]
    else:
        pytest.fail("compaction did not converge")
    assert sorted(tuple(x) for x in
                  spark.read.parquet(src).collect()) == before


def test_noop_below_min_files(spark, tmp_path):
    (events,) = load(spark, SF_DIR, "events")
    src = str(tmp_path / "one")
    events.coalesce(1).write.parquet(src)
    report = compact_parquet_dir(spark, src, target_file_bytes=1)
    assert not report["compacted"] and report["files_before"] == 1


def test_recovers_from_crash_window(spark, tmp_path):
    """Simulated crash between os.replace(base, bak) and
    os.replace(tmp, base): the zone exists only at .compact-bak. The
    next compaction call must restore it and proceed (ADVICE r5)."""
    (events,) = load(spark, SF_DIR, "events")
    src = str(tmp_path / "crashed")
    events.repartition(8).write.parquet(src)
    before = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    os.replace(src, src + ".compact-bak")  # the crash state
    assert not os.path.exists(src)

    report = compact_parquet_dir(spark, src, target_file_bytes=1 << 30)
    assert os.path.isdir(src) and not os.path.exists(src + ".compact-bak")
    assert report["files_before"] == 8
    after = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    assert after == before


def test_rejects_remote_schemes(spark):
    with pytest.raises((ValueError, Exception)) as e:
        compact_parquet_dir(spark, "s3://bucket/zone")
    assert "s3" in str(e.value) or "local" in str(e.value).lower() \
        or "scheme" in str(e.value).lower()


def test_partitioned_zone_rejected(spark, tmp_path):
    (events,) = load(spark, SF_DIR, "events")
    zone = str(tmp_path / "pzone")
    (events.withColumn("part", events.user_id % 2)
     .write.partitionBy("part").parquet(zone))
    with pytest.raises(ValueError, match="partition"):
        compact_parquet_dir(spark, zone)


# ----------------------------------------------- OPTIMIZE ... WHERE (r9)
def test_scoped_compact_touches_only_overlapping_files(spark, tmp_path):
    """OPTIMIZE WHERE: files whose footer stats fall outside the scope
    keep their bytes — at 100 TB you optimize the day's ingest, not
    the table."""
    import glob
    import os

    from aws_payment_data_lake_spark.sources.txlog import TxnTable

    t = TxnTable(spark, str(tmp_path / "scoped"))
    t.create(spark.range(100).selectExpr("id", "id AS v"),
             partition_by=["id"], partition_files=4)
    # fragment the low range only
    for k in range(3):
        t.append(spark.createDataFrame([(k, k)], "id long, v long"))
    state = {p: os.path.getmtime(p) for p in
             glob.glob(os.path.join(t.path, "data", "*", "*.parquet"))}
    res = t.compact(max_files=1, scope=("id", 0, 10))
    assert res["noop"] == 0
    # files covering the high ranges are byte-identical
    snap = t._replay()
    survivors = [p for p, mt in state.items()
                 if os.path.exists(p) and os.path.getmtime(p) == mt]
    assert len(survivors) >= 3          # the 3 upper-range base files
    assert sorted(r["id"] for r in t.snapshot().collect()) \
        == sorted(list(range(100)) + [0, 1, 2])
    # scoped zorder: same selection contract
    res2 = t.optimize(["v"], n_files=1, scope=("id", 90, 99))
    assert 0 < res2["files_in"] < len(snap.live)


def test_scoped_optimize_sql(spark, tmp_path):
    from aws_payment_data_lake_spark.sources.txsql import (
        LakehouseCatalog,
    )

    cat = LakehouseCatalog(spark)
    cat.register("sc", str(tmp_path / "sc"))
    spark.range(100).selectExpr("id", "id AS v") \
        .createOrReplaceTempView("__sc_seed")
    cat.sql("CREATE TABLE sc USING txlog PARTITIONED BY (id) "
            "AS SELECT * FROM __sc_seed")
    # fragment the low range past the 16-file bin target
    for k in range(18):
        cat.sql(f"INSERT INTO sc VALUES ({k % 5}, {k})")
    res = {r["metric"]: r["value"] for r in cat.sql(
        "OPTIMIZE sc WHERE id BETWEEN 0 AND 5").collect()}
    assert res["noop"] == 0
    assert res["files_in"] > res["files_out"]
    assert cat.sql("SELECT count(*) AS n FROM sc").first()["n"] == 118
