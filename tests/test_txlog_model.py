"""Model-based and cross-process tests for the ACID format.

1. Cross-PROCESS commit races: the hard-link mutex is a kernel-level
   primitive, so it is exercised with real concurrent processes
   hammering the same log (no Spark needed — commits are pure
   metadata). Every attempted commit must land exactly once, versions
   must be gap-free, and no commit content may be lost or torn.

2. Model-based op sequences: seeded random programs of
   append/merge/delete/update/compact/optimize/vacuum run against both
   the real table and an in-memory dict model; content must match
   after every step, and time travel must reproduce each recorded
   model snapshot exactly (until vacuum retires it)."""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import random

import pytest

from aws_payment_data_lake_spark.sources.txlog import TxnTable


# ---------------------------------------------------------------- 1.
def _hammer(path: str, writer_id: int, n_commits: int, out_q) -> None:
    t = TxnTable(None, path)
    won = []
    for k in range(n_commits):
        commit = {"op": "append", "ts": 0.0,
                  "add": [{"path": f"data/w{writer_id}/f{k}.parquet",
                           "rows": 1, "bytes": 1, "stats": {}}],
                  "remove": []}
        while True:
            vs = t._versions_on_disk()
            v = (vs[-1] + 1) if vs else 0
            if t._try_publish(v, commit):
                won.append(v)
                break
    out_q.put((writer_id, won))


def test_cross_process_commit_race(tmp_path):
    """6 processes x 25 commits on one log: 150 distinct gap-free
    versions, every commit's content intact (the hard link is both
    mutex and content barrier across real process boundaries)."""
    path = str(tmp_path / "tbl")
    os.makedirs(os.path.join(path, "_txlog"))
    n_proc, per = 6, 25
    q = mp.Queue()
    procs = [mp.Process(target=_hammer, args=(path, w, per, q))
             for w in range(n_proc)]
    [p.start() for p in procs]
    results = [q.get(timeout=120) for _ in range(n_proc)]
    [p.join(timeout=30) for p in procs]

    all_versions = [v for _, won in results for v in won]
    assert len(all_versions) == n_proc * per
    assert sorted(all_versions) == list(range(n_proc * per))  # gap-free,
    #                                                  no double-claims
    t = TxnTable(None, path)
    claimed = {}
    for v in range(n_proc * per):
        with open(t._commit_path(v)) as f:
            c = json.load(f)          # parses -> never torn
        claimed[v] = c["add"][0]["path"]
    # each version's content belongs to exactly the writer that won it
    for wid, won in results:
        for v in won:
            assert claimed[v].startswith(f"data/w{wid}/")


# ---------------------------------------------------------------- 2.
def _model_df(spark, rows: dict[int, int]):
    data = [(k, v) for k, v in rows.items()]
    return spark.createDataFrame(data or [], "id long, v long")


def _table_rows(t: TxnTable, version=None) -> dict[int, int]:
    return {r["id"]: r["v"] for r in t.snapshot(version).collect()}


@pytest.mark.parametrize("seed", [11, 23])
def test_model_based_op_sequence(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = TxnTable(spark, str(tmp_path / f"tbl{seed}"))
    next_key = 100
    model: dict[int, int] = {i: i for i in range(8)}
    t.create(_model_df(spark, model))
    history: dict[int, dict[int, int]] = {0: dict(model)}

    def fresh_keys(n):
        nonlocal next_key
        ks = list(range(next_key, next_key + n))
        next_key += n
        return ks

    for step in range(12):
        op = rng.choice(["append", "merge", "cdc_merge", "delete",
                         "update", "compact", "optimize", "restore",
                         "dv_delete", "dv_update"])
        if op == "append":
            ks = fresh_keys(rng.randint(1, 5))
            batch = {k: k * 2 for k in ks}
            v = t.append(_model_df(spark, batch))
            model.update(batch)
            history[v] = dict(model)
        elif op == "merge":
            updates = {k: rng.randint(0, 999)
                       for k in rng.sample(sorted(model),
                                           min(3, len(model)))}
            inserts = {k: -k for k in fresh_keys(2)}
            src = {**updates, **inserts}
            res = t.merge(_model_df(spark, src), on=["id"])
            model.update(src)
            history[res["version"]] = dict(model)
        elif op == "cdc_merge":
            # the delete_when clause under random interleaving: some
            # existing keys upsert, some delete, some unmatched
            # deletes no-op, some fresh keys insert
            pool = rng.sample(sorted(model), min(4, len(model)))
            ups = {k: rng.randint(0, 999) for k in pool[:2]}
            dels = set(pool[2:])
            ghost_dels = set(fresh_keys(1))       # unmatched + flagged
            inserts = {k: -k for k in fresh_keys(1)}
            rows = ([(k, v, "u") for k, v in {**ups, **inserts}.items()]
                    + [(k, 0, "d") for k in dels | ghost_dels])
            src = spark.createDataFrame(rows, "id long, v long, _op string")
            res = t.merge(src, on=["id"], delete_when="_op = 'd'")
            model.update(ups)
            model.update(inserts)
            for k in dels:
                del model[k]
            history[res["version"]] = dict(model)
        elif op == "delete":
            lo = rng.randint(0, next_key)
            res = t.delete(f"id >= {lo} and id < {lo + 40}")
            removed = [k for k in model if lo <= k < lo + 40]
            for k in removed:
                del model[k]
            assert res["rows_changed"] == len(removed)
            if res["files_rewritten"]:
                history[res["version"]] = dict(model)
        elif op == "update":
            lo = rng.randint(0, next_key)
            res = t.update({"v": "v + 1000"}, f"id >= {lo} and id < {lo + 20}")
            hit = [k for k in model if lo <= k < lo + 20]
            for k in hit:
                model[k] += 1000
            assert res["rows_changed"] == len(hit)
            if res["files_rewritten"]:
                history[res["version"]] = dict(model)
        elif op == "dv_delete":
            lo = rng.randint(0, next_key)
            res = t.delete(f"id >= {lo} and id < {lo + 30}", mode="dv")
            removed = [k for k in model if lo <= k < lo + 30]
            for k in removed:
                del model[k]
            assert res["rows_changed"] == len(removed)
            assert res["files_rewritten"] == 0
            if res["rows_changed"]:
                history[res["version"]] = dict(model)
        elif op == "dv_update":
            lo = rng.randint(0, next_key)
            res = t.update({"v": "v + 7"}, f"id >= {lo} and id < {lo + 15}",
                           mode="dv")
            hit = [k for k in model if lo <= k < lo + 15]
            for k in hit:
                model[k] += 7
            assert res["rows_changed"] == len(hit)
            assert res["files_rewritten"] == 0
            if res["rows_changed"]:
                history[res["version"]] = dict(model)
        elif op == "restore":
            tv = rng.choice(sorted(history))
            v = t.restore(version=tv)
            model = dict(history[tv])
            history[v] = dict(model)
        elif op == "compact":
            r = t.compact(max_files=2)
            if not r["noop"]:
                history[r["version"]] = dict(model)
        else:
            r = t.optimize(zorder_by=["id"], n_files=2, bits=4)
            if not r["noop"]:
                history[r["version"]] = dict(model)
        assert _table_rows(t) == model, f"divergence after step {step} {op}"

    # time travel reproduces every recorded model snapshot
    for v, snap in history.items():
        assert _table_rows(t, v) == snap, f"time travel to v{v} diverged"
    # vacuum keeps the last two versions readable, content unchanged
    t.vacuum(retain_versions=2, orphan_grace_s=0.0)
    assert _table_rows(t) == model
