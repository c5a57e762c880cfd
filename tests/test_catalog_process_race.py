"""Two-OS-PROCESS catalog races (VERDICT r11 stretch #8).

`sources/catalog.py:28-34` documents the CAS contract: concurrent
registrations of DIFFERENT names both land (the loser re-applies its
mutation on the winner's map), and a same-name CREATE race surfaces
as exactly one TableExistsError from the re-applied mutation. The
in-process `test_catalog.py::test_concurrent_registration_race_both_
land` exercises the loop; this module proves the claims across real
OS processes synchronized by a file barrier — the put-if-absent
hardlink itself. No SparkSession involved: the catalog log is pure
filesystem, which is the point.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

from tests.conftest import REPO

_CREATOR = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
from aws_payment_data_lake_spark.sources.catalog import (
    CatalogLog, TableExistsError)
wh, who, barrier, name, n_extra = (sys.argv[2], sys.argv[3],
                                   sys.argv[4], sys.argv[5],
                                   int(sys.argv[6]))
log = CatalogLog(wh)
open(os.path.join(barrier, "ready-" + who), "w").close()
while not os.path.exists(os.path.join(barrier, "go")):
    time.sleep(0.002)

def create(nm):
    def put(tables):
        if nm in tables:
            raise TableExistsError(nm)
        tables[nm] = {"path": os.path.join(wh, nm),
                      "delete_mode": "cow", "by": who}
        return tables
    log.commit("create", nm, put)

outcome = {"who": who, "same_name": "created", "extras": 0}
try:
    create(name)                       # the CONTESTED name
except TableExistsError:
    outcome["same_name"] = "exists"
for i in range(n_extra):               # uncontested names: all land
    create(f"{who}_t{i}")
    outcome["extras"] += 1
print("OUT " + json.dumps(outcome))
"""


def test_two_process_create_race_one_winner_and_all_extras_land(
        tmp_path):
    from aws_payment_data_lake_spark.sources.catalog import CatalogLog
    wh = str(tmp_path / "wh")
    barrier = str(tmp_path / "barrier")
    os.makedirs(wh)
    os.makedirs(barrier)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _CREATOR, REPO, wh, who, barrier,
         "contested", "8"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for who in ("a", "b")]
    deadline = time.time() + 60
    while time.time() < deadline and not all(
            os.path.exists(os.path.join(barrier, f"ready-{w}"))
            for w in ("a", "b")):
        time.sleep(0.01)
    open(os.path.join(barrier, "go"), "w").close()
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=120)
        assert p.returncode == 0, se[-2000:]
        outs.append(json.loads(
            [ln for ln in so.splitlines()
             if ln.startswith("OUT ")][-1][4:]))
    # exactly ONE winner of the contested name
    states = sorted(o["same_name"] for o in outs)
    assert states == ["created", "exists"], outs
    # every uncontested registration landed despite the CAS retries
    assert all(o["extras"] == 8 for o in outs)
    v, tables = CatalogLog(wh).load()
    assert set(tables) == ({"contested"}
                           | {f"a_t{i}" for i in range(8)}
                           | {f"b_t{i}" for i in range(8)})
    # the log is gap-free: versions 0..v all present
    cdir = os.path.join(wh, "_catalog")
    present = sorted(int(n[:-5]) for n in os.listdir(cdir)
                     if n.endswith(".json") and not n.startswith("."))
    assert present == list(range(v + 1))
    # the contested winner's entry carries exactly one author
    assert tables["contested"]["by"] in ("a", "b")
