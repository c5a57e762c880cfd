"""Conformance pin for TXLOG_FORMAT.md's LogStore section (VERDICT r9
#4): the commit protocol's storage footprint IS the portability
contract. If `_try_publish` or `_maybe_checkpoint` start calling
storage operations outside the declared sets, this test fails and the
spec (plus any object-store LogStore port) must be revisited together
— the same discipline as the independent-reader interop pin."""

from __future__ import annotations

import inspect
import re

from aws_payment_data_lake_spark.sources.txlog import TxnTable


def _os_ops(fn) -> set[str]:
    src = inspect.getsource(fn)
    return set(re.findall(r"\bos\.((?:path\.)?[a-z_]+)\s*\(", src))


def test_try_publish_uses_only_put_if_absent_primitives():
    """Property 1 (put-if-absent): makedirs + fsync'd temp + hard link
    + unlink, nothing else. In particular no rename/replace (not a
    claim arbiter) and no listing (claims are arbitrated by the link,
    never by what a writer saw)."""
    ops = _os_ops(TxnTable._try_publish)
    assert ops == {"makedirs", "path.join", "fsync", "link", "unlink"}, \
        f"_try_publish storage footprint changed: {sorted(ops)} — " \
        "update TXLOG_FORMAT.md 'LogStore contract' and this pin " \
        "together"


def test_checkpoint_uses_only_idempotent_replace():
    """Property 2 (last-writer-wins replace of derived data): tmp +
    os.replace only — no link (a checkpoint must never become a claim)
    and no deletes."""
    ops = _os_ops(TxnTable._maybe_checkpoint)
    assert ops == {"path.join", "replace"}, \
        f"_maybe_checkpoint storage footprint changed: {sorted(ops)} " \
        "— update TXLOG_FORMAT.md 'LogStore contract' and this pin " \
        "together"


def test_commit_claim_never_reads_before_linking():
    """The writer must not gate the claim on a listing or existence
    check — property 1's conditional write is the only arbiter (an
    eventually-consistent listing would make exists() a lost-update
    vector)."""
    src = inspect.getsource(TxnTable._try_publish)
    for banned in ("os.listdir", "os.path.exists", "os.path.isfile",
                   "os.stat"):
        assert banned not in src, \
            f"_try_publish consults {banned}: claims must be " \
            "arbitrated by the atomic link alone"
