"""Model-based property test of the ACID commit protocol
(sources/txlog.py): for RANDOM operation sequences — append, DELETE
and UPDATE in both copy-on-write and deletion-vector modes,
overwrite, restore, compaction, SHALLOW CLONE mid-sequence (the rest
of the sequence continues on the fork), and txlog.appendOnly toggles
— the table's visible rows must equal a trivially-correct pure-Python
fold after EVERY op, the metadata-only count must agree, every
recorded version must time-travel back to exactly the model's rows at
that version, and fsck must stay clean. Deterministic examples
(derandomize): the property, not the sample, is the contract. This is
where cross-feature interactions live (DV state across restore,
clones of DV'd tables, append-only rejection leaving state
untouched) that single-feature tests can't enumerate."""

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

_OP = st.one_of(
    st.tuples(st.just("append"), st.integers(1, 3)),
    st.tuples(st.just("delete"), st.integers(2, 4),
              st.integers(0, 3), st.sampled_from(["cow", "dv"])),
    st.tuples(st.just("update"), st.integers(2, 4),
              st.integers(0, 3), st.sampled_from(["cow", "dv"])),
    st.tuples(st.just("overwrite"), st.integers(1, 3)),
    st.tuples(st.just("restore"), st.floats(0.0, 1.0)),
    st.tuples(st.just("compact")),
    st.tuples(st.just("clone")),
    st.tuples(st.just("toggle_append_only")),
)


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(ops=st.lists(_OP, min_size=3, max_size=7))
def test_random_op_sequences_match_model(spark, ops):
    root = tempfile.mkdtemp(prefix="txmodel-")
    try:
        t = TxnTable(spark, os.path.join(root, "t0"))
        t.create(spark.createDataFrame([], "id long, v long"))
        model: dict[int, int] = {}
        hist = {t.latest_version(): dict(model)}
        next_id = 0
        append_only = False
        n_tables = 0
        for op in ops:
            kind = op[0]
            if kind == "append":
                k = op[1]
                rows = [(next_id + i, next_id + i) for i in range(k)]
                next_id += k
                t.append(spark.createDataFrame(rows, "id long, v long"))
                model.update(dict(rows))
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
                    model = dict(hist[target])
            elif kind == "compact":
                t.compact(max_files=1)      # layout-only: model fixed
            elif kind == "clone":
                n_tables += 1
                fork = TxnTable(spark, os.path.join(root,
                                                    f"t{n_tables}"))
                fork.clone_shallow(t)
                if append_only:
                    # properties travel with the clone
                    fork.unset_properties(["txlog.appendOnly"])
                    append_only = False
                t = fork                     # continue on the fork
                hist = {}                    # fresh log, fresh history
            elif kind == "toggle_append_only":
                if append_only:
                    t.unset_properties(["txlog.appendOnly"])
                else:
                    t.set_properties({"txlog.appendOnly": "true"})
                append_only = not append_only
            hist[t.latest_version()] = dict(model)
            got = {r.id: r.v for r in t.snapshot().collect()}
            assert got == model, f"after {op}: {got} != {model}"
            assert t.count_rows() == len(model)
        # every recorded version time-travels to the model's rows
        for ver, rows in hist.items():
            got = {r.id: r.v for r in
                   t.snapshot(version=ver).collect()}
            assert got == rows, f"time travel to v{ver}"
        assert t.fsck()["clean"] is True
    finally:
        shutil.rmtree(root, ignore_errors=True)
