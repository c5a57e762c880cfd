"""Metadata-path scale proof for the ACID format: the log is the part
that must stay cheap at 100 TB (data files are Spark's problem; the
format's own cost is replay + prune over FILE metadata). Fabricates a
log with thousands of commits / ~100k live files directly (pure
metadata, no Spark) and bounds replay and prune latency, checkpointed
vs raw."""

from __future__ import annotations

import json
import os
import time

from aws_payment_data_lake_spark.sources.txlog import AddFile, TxnTable


def _fabricate(path: str, n_commits: int, files_per_commit: int,
               checkpoint_every: int) -> TxnTable:
    t = TxnTable(None, path, checkpoint_every=checkpoint_every)
    os.makedirs(t._log)
    schema_json = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}}]})
    for v in range(n_commits):
        adds = [{"path": f"data/w{v}/f{k}.parquet", "rows": 1000,
                 "bytes": 1 << 20,
                 "stats": {"id": [v * 1000 + k, v * 1000 + k + 1]}}
                for k in range(files_per_commit)]
        commit = {"op": "create" if v == 0 else "append", "ts": 0.0,
                  "add": adds, "remove": []}
        if v == 0:
            commit["schema_json"] = schema_json
            commit["partition_by"] = []
        assert t._try_publish(v, commit)
        if v and v % checkpoint_every == 0:
            t._maybe_checkpoint(v)
    return t


def test_replay_and_prune_at_100k_files(tmp_path):
    """2,000 commits x 50 files = 100k live files (~100 TB at 1 GB
    files): checkpointed replay under 2 s, file pruning under 1 s, and
    the checkpoint actually bounds the JSON tail that is re-read."""
    t = _fabricate(str(tmp_path / "big"), n_commits=2000,
                   files_per_commit=50, checkpoint_every=500)

    t0 = time.time()
    snap = t._replay()
    replay_s = time.time() - t0
    assert len(snap.live) == 100_000
    assert replay_s < 2.0, f"checkpointed replay took {replay_s:.2f}s"

    t0 = time.time()
    kept, total = t.scan_file_count("id", 500_000, 500_010)
    prune_s = time.time() - t0
    # files k=0..10 of commit 500 overlap [500000, 500010]
    assert total == 100_000 and kept == 11
    assert prune_s < 1.0, f"prune took {prune_s:.2f}s"

    # the checkpoint must be doing the bounding: replay from raw JSON
    # only (checkpoint pointer removed) is strictly more work
    os.unlink(os.path.join(t._log, "_last_checkpoint"))
    t0 = time.time()
    snap2 = t._replay()
    raw_s = time.time() - t0
    assert len(snap2.live) == 100_000
    assert raw_s > replay_s, (
        f"raw replay {raw_s:.2f}s not slower than checkpointed "
        f"{replay_s:.2f}s — checkpoint isn't bounding the tail")
