"""Multi-process preemption under real SIGKILL (VERDICT r4 item 2).

Four legs via tools/run_mp_cluster.py --preempt on a real 2-process gloo
CPU cluster (the closest this container gets to a preempted TPU pod):

* the WHOLE cluster SIGKILLed from outside once a checkpoint committed —
  restart restores the multi-process Orbax checkpoint and the post-resume
  losses are bitwise-continuous with an uninterrupted cluster run;
* every process SIGKILLs itself right after initiating an async save (the
  coordinated multi-host commit dies in flight) — the restart selects a
  loadable checkpoint, never the partial tmp dir;
* ONE process SIGKILLed (a non-coordinator, then the coordinator): the
  survivor must terminate with an error within the heartbeat bound
  (initialize_distributed heartbeat_timeout_seconds) instead of hanging in
  a collective until a pod scheduler times it out.

Reference anchor: /root/reference/train.py:204-223 — cooperative resume
only; none of these failure modes have any story there.
"""
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


def test_preemption_legs_two_process_cluster(tmp_path):
    record_path = tmp_path / "record.json"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "run_mp_cluster.py"),
            "--preempt",
            "--processes", "2",
            "--outdir", str(tmp_path / "runs"),
            "--record", str(record_path),
        ],
        capture_output=True,
        text=True,
        timeout=2400,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, f"driver failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}"
    record = json.loads(record_path.read_text())

    a1 = record["kill_whole_cluster_committed"]
    assert a1["killed"] and a1["continuity"] and a1["resumed_from"] >= 1, a1

    a2 = record["kill_all_mid_async_save"]
    assert all(rc != 0 for rc in a2["crash_rcs"]), a2  # every process really died
    assert a2["resumed_from"] <= record["steps"] - 2 and a2["continuity"], a2

    for leg in ("kill_nonprimary", "kill_coordinator"):
        b = record[leg]
        assert b["underway"], b
        assert b["survivor_exit_s"] is not None and b["survivor_exit_s"] <= 300, (
            f"{leg}: survivor did not fail fast: {b}"
        )
        assert all(rc != 0 for rc in b["survivor_rcs"]), b

    assert record["ok"]
