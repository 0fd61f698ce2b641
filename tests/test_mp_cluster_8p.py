"""Every mesh axis across the process boundary: 8 processes x 1 device
(VERDICT r4 item 3).

The 2-process cluster (test_mp_cluster.py) keeps each TP pair inside one
process, so the gloo collectives inside layer matmuls (all-gather /
reduce-scatter of activations on the model axis) never cross a process.
With 8 single-device processes over the same 4x2 (data, model) mesh, EVERY
collective — TP activation collectives, Muon's cross-shard matmuls, the
global-batch assembly, eval's replicated outputs — rides the wire between
processes: the closest this container gets to a real multi-host pod's
communication pattern. Losses must match the single-process 8-device run
of the identical stream.
"""
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


def test_eight_process_single_device_cluster(tmp_path):
    record_path = tmp_path / "record.json"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "run_mp_cluster.py"),
            "--processes", "8",
            "--steps", "3",
            "--resume-steps", "4",
            "--baseline",
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

    assert record["cluster"]["process_count"] == 8
    assert record["cluster"]["devices_global"] == 8
    assert record["cluster"]["devices_local"] == 1

    # loss parity vs the single-process 8-device mesh of the same stream:
    # the TP collectives crossing processes must not change the math
    assert record["baseline"]["train_loss_max_delta"] < 1e-3
    assert record["baseline"]["eval_loss_max_delta"] < 1e-3
    assert record["baseline"]["zero_shot_accuracy_equal"]

    assert record["resume"]["resumed_from"] == 3
    assert record["resume"]["final_step"] == 4
    assert record["ok"]
