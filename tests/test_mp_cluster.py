"""Multi-PROCESS distributed execution (VERDICT r3 item 1).

Spawns a real 2-process JAX cluster (localhost coordinator, gloo CPU
collectives, 4 devices per process) via tools/run_mp_cluster.py and runs the
real Trainer through the multi-host code paths that single-process virtual
meshes can never reach:

* ``initialize_distributed`` / ``jax.distributed.initialize``
* ``put_global_batch``'s ``make_array_from_process_local_data`` branch
  (train AND eval batches)
* multi-process Orbax save + sharded-template restore (the resume leg
  restarts the cluster and must continue from the checkpoint)
* primary-only logging (process 1 writes to devnull)

and asserts per-step losses match a single-process 8-device run of the
identical global data stream to fp tolerance.

Reference anchor: the reference delegates all of this to torch.distributed
DDP and ships it untested (train.py:198-201, utils/muon_utils.py:131-136).
"""
import pytest

import json
import subprocess
import sys
from pathlib import Path


pytestmark = pytest.mark.slow  # see pytest.ini: excluded from the quick gate
REPO = Path(__file__).resolve().parent.parent


def test_two_process_cluster_matches_single_process(tmp_path):
    record_path = tmp_path / "record.json"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "run_mp_cluster.py"),
            "--processes", "2",
            "--steps", "4",
            "--resume-steps", "5",
            "--baseline",
            "--outdir", str(tmp_path / "runs"),
            "--record", str(record_path),
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, f"driver failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    record = json.loads(record_path.read_text())

    # the cluster really was 2 processes x 4 devices over one 8-device mesh
    assert record["cluster"]["process_count"] == 2
    assert record["cluster"]["devices_global"] == 8
    assert record["cluster"]["devices_local"] == 4

    # loss parity vs the single-process 8-device run of the same stream
    assert record["baseline"]["train_loss_max_delta"] < 1e-3
    assert record["baseline"]["eval_loss_max_delta"] < 1e-3
    assert record["baseline"]["zero_shot_accuracy_equal"]

    # multi-process Orbax restore: the resume leg restarted the 2-process
    # cluster, restored step 4 from the sharded checkpoint, and trained on
    assert record["resume"]["resumed_from"] == 4
    assert record["resume"]["final_step"] == 5
    assert record["resume"]["ok"]

    # primary-only logging: each step logged exactly once (two writers
    # would duplicate rows), and worker_result.json came from process 0
    rows = record["cluster"]["log_rows"]
    train_steps = [r["step"] for r in rows if "loss" in r]
    assert sorted(train_steps) == sorted(set(train_steps))
    assert record["ok"]
