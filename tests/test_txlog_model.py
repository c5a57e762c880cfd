"""Model-based property test of the ACID commit protocol
(sources/txlog.py): for RANDOM operation sequences — append, DELETE
and UPDATE in both copy-on-write and deletion-vector modes,
overwrite, CREATE OR REPLACE, replaceWhere, restore, compaction,
SHALLOW and DEEP CLONE mid-sequence (the rest of the sequence
continues on the fork; the deep clone's SOURCE is rmtree'd first —
independence is the contract), COPY INTO of an accumulating
landing zone, column-DEFAULT toggles with defaults-filled appends,
txlog.appendOnly toggles, and change-data-feed toggles (image
capture riding every DML) — the table's visible rows must equal a
trivially-correct pure-Python fold after EVERY op, the metadata-only
count must agree, every recorded version must time-travel back to
exactly the model's rows at that version, and fsck must stay clean.
Deterministic examples (derandomize): the property, not the sample,
is the contract. This is where cross-feature interactions live (DV
state across restore, clones of DV'd tables, defaults rolling back
with restore but surviving a clone, append-only rejection leaving
state untouched, copy idempotence across restores) that
single-feature tests can't enumerate."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_payment_data_lake_spark.sources.txlog import (
    AppendOnlyError,
    TxnTable,
)

_DEFAULT_V = 77

_OP = st.one_of(
    st.tuples(st.just("append"), st.integers(1, 3)),
    st.tuples(st.just("append_omit_v"), st.integers(1, 2)),
    st.tuples(st.just("delete"), st.integers(2, 4),
              st.integers(0, 3), st.sampled_from(["cow", "dv"])),
    st.tuples(st.just("update"), st.integers(2, 4),
              st.integers(0, 3), st.sampled_from(["cow", "dv"])),
    st.tuples(st.just("overwrite"), st.integers(1, 3)),
    st.tuples(st.just("restore"), st.floats(0.0, 1.0)),
    st.tuples(st.just("compact")),
    st.tuples(st.just("clone")),
    st.tuples(st.just("deep_clone")),
    st.tuples(st.just("replace"), st.integers(1, 3)),
    st.tuples(st.just("replace_where"), st.integers(1, 2),
              st.integers(2, 4), st.integers(0, 3)),
    st.tuples(st.just("copy"), st.integers(1, 3)),
    st.tuples(st.just("toggle_default")),
    st.tuples(st.just("toggle_append_only")),
    st.tuples(st.just("toggle_cdf")),
)


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(ops=st.lists(_OP, min_size=3, max_size=7))
def test_random_op_sequences_match_model(spark, ops):
    root = tempfile.mkdtemp(prefix="txmodel-")
    land = os.path.join(root, "landing")
    try:
        t = TxnTable(spark, os.path.join(root, "t0"))
        t.create(spark.createDataFrame([], "id long, v long"))
        model: dict[int, int] = {}
        has_default = False
        hist = {t.latest_version(): (dict(model), has_default)}
        next_id = 0
        append_only = cdf_on = False
        n_tables = n_land = 0
        for op in ops:
            kind = op[0]
            if kind == "append":
                k = op[1]
                rows = [(next_id + i, next_id + i) for i in range(k)]
                next_id += k
                t.append(spark.createDataFrame(rows, "id long, v long"))
                model.update(dict(rows))
            elif kind == "append_omit_v":
                k = op[1]
                ids = list(range(next_id, next_id + k))
                next_id += k
                df = spark.createDataFrame([(i,) for i in ids],
                                           "id long")
                if has_default:
                    t.append(df)
                    model.update({i: _DEFAULT_V for i in ids})
                else:
                    with pytest.raises(ValueError,
                                       match="schema mismatch"):
                        t.append(df)
            elif kind == "delete":
                _, m, r, mode = op
                if append_only:
                    with pytest.raises(AppendOnlyError):
                        t.delete(f"id % {m} = {r}", mode=mode)
                else:
                    t.delete(f"id % {m} = {r}", mode=mode)
                    model = {i: v for i, v in model.items()
                             if i % m != r}
            elif kind == "update":
                _, m, r, mode = op
                if append_only:
                    with pytest.raises(AppendOnlyError):
                        t.update({"v": "v + 100"}, f"id % {m} = {r}",
                                 mode=mode)
                else:
                    t.update({"v": "v + 100"}, f"id % {m} = {r}",
                             mode=mode)
                    model = {i: (v + 100 if i % m == r else v)
                             for i, v in model.items()}
            elif kind == "overwrite":
                k = op[1]
                rows = [(next_id + i, next_id + i) for i in range(k)]
                next_id += k
                df = spark.createDataFrame(rows, "id long, v long")
                if append_only:
                    with pytest.raises(AppendOnlyError):
                        t.overwrite(df)
                else:
                    t.overwrite(df)
                    model = dict(rows)
            elif kind == "restore":
                vers = sorted(hist)
                target = vers[int(op[1] * (len(vers) - 1))]
                if append_only:
                    with pytest.raises(AppendOnlyError):
                        t.restore(version=target)
                else:
                    t.restore(version=target)
                    model, has_default = (dict(hist[target][0]),
                                          hist[target][1])
            elif kind == "compact":
                t.compact(max_files=1)      # layout-only: model fixed
            elif kind == "clone":
                n_tables += 1
                fork = TxnTable(spark, os.path.join(root,
                                                    f"t{n_tables}"))
                fork.clone_shallow(t)       # defaults travel with it
                if append_only:
                    fork.unset_properties(["txlog.appendOnly"])
                    append_only = False
                t = fork                     # continue on the fork
                hist = {}                    # fresh log, fresh history
            elif kind == "deep_clone":
                n_tables += 1
                fork = TxnTable(spark, os.path.join(root,
                                                    f"t{n_tables}"))
                fork.clone_deep(t)
                if append_only:
                    fork.unset_properties(["txlog.appendOnly"])
                    append_only = False
                # INDEPENDENCE is the contract: obliterate the source
                # and keep running the sequence on the fork
                shutil.rmtree(t.path)
                t = fork
                hist = {}
            elif kind == "replace":
                k = op[1]
                rows = [(next_id + i, next_id + i) for i in range(k)]
                next_id += k
                df = spark.createDataFrame(rows, "id long, v long")
                if append_only:
                    with pytest.raises(AppendOnlyError):
                        t.replace(df)
                else:
                    t.replace(df)            # CREATE OR REPLACE:
                    model = dict(rows)       # content + metadata swap
                    has_default = False      # defaults reset
                    cdf_on = False           # properties reset
            elif kind == "replace_where":
                _, k, m, r = op
                r = r % m
                ids, j = [], next_id
                while len(ids) < k:          # fresh ids satisfying
                    cand = m * j + r         # the predicate, no reuse
                    j += 1
                    if cand not in model:
                        ids.append(cand)
                next_id = j
                df = spark.createDataFrame([(i, i) for i in ids],
                                           "id long, v long")
                if append_only:
                    with pytest.raises(AppendOnlyError):
                        t.replace_where(df, f"id % {m} = {r}")
                else:
                    t.replace_where(df, f"id % {m} = {r}")
                    model = {i: v for i, v in model.items()
                             if i % m != r}
                    model.update({i: i for i in ids})
            elif kind == "copy":
                k = op[1]
                ids = list(range(next_id, next_id + k))
                next_id += k
                n_land += 1
                (spark.createDataFrame([(i, i) for i in ids],
                                       "id long, v long")
                 .coalesce(1).write.parquet(
                     os.path.join(land, f"f{n_land}")))
                got = t.copy_into(land)      # idempotent: only f{n}
                assert got["rows_loaded"] == k
                model.update({i: i for i in ids})
            elif kind == "toggle_default":
                if has_default:
                    t.drop_column_default("v")
                else:
                    t.set_column_default("v", str(_DEFAULT_V))
                has_default = not has_default
            elif kind == "toggle_append_only":
                if append_only:
                    t.unset_properties(["txlog.appendOnly"])
                else:
                    t.set_properties({"txlog.appendOnly": "true"})
                append_only = not append_only
            elif kind == "toggle_cdf":
                # change-data capture riding EVERY DML in the
                # sequence: the visible-rows model must hold with the
                # image writes interleaved (and vacuum/fsck after)
                if cdf_on:
                    t.unset_properties(["txlog.enableChangeDataFeed"])
                else:
                    t.set_properties(
                        {"txlog.enableChangeDataFeed": "true"})
                cdf_on = not cdf_on
            hist[t.latest_version()] = (dict(model), has_default)
            got = {r.id: r.v for r in t.snapshot().collect()}
            assert got == model, f"after {op}: {got} != {model}"
            assert t.count_rows() == len(model)
            # stats-metadata invariants hold after EVERY op (r12):
            # min <= max, string stats prefix-bounded (64 + the
            # round-up ceil char), null counts within [0, rows]
            for a in t._replay().live.values():
                assert a.rows >= 0 and a.bytes > 0
                for mm in a.stats.values():
                    try:
                        assert mm[0] <= mm[1], (a.path, mm)
                    except TypeError:
                        pass             # mixed JSON forms: no order
                    if isinstance(mm[0], str):
                        assert len(mm[0]) <= 64 and len(mm[1]) <= 65
                for nc in a.nulls.values():
                    assert 0 <= nc <= a.rows, (a.path, a.nulls)
        # every recorded version time-travels to the model's rows
        for ver, (rows, _) in hist.items():
            got = {r.id: r.v for r in
                   t.snapshot(version=ver).collect()}
            assert got == rows, f"time travel to v{ver}"
        assert t.fsck()["clean"] is True
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_pinned_sequence_covers_round11_ops(spark):
    """Deterministic companion to the random property: one sequence
    that provably exercises replace, replace_where, deep_clone (with
    source obliteration) and the CDF toggle against the model —
    hypothesis sampling must not be what stands between these ops and
    coverage."""
    ops = [("append", 3), ("toggle_cdf",), ("replace_where", 2, 2, 1),
           ("update", 2, 0, "dv"), ("deep_clone",), ("replace", 2),
           ("toggle_cdf",), ("append", 2), ("delete", 3, 1, "cow"),
           ("clone",), ("replace_where", 1, 3, 0), ("restore", 0.5),
           ("compact",)]
    test_random_op_sequences_match_model.hypothesis.inner_test(
        spark, ops)
