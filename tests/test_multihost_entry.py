"""The train.py ENTRY POINT's multihost branch, executed.

tools/run_mp_cluster.py exercises the Trainer over a real 2-process
cluster; this test executes the remaining never-run layer above it — the
`training.multihost=true` gate in train.py (process-group init before any
backend use, per-process synthetic data, primary-only artifacts) — by
spawning two real `python train.py --cpu` processes against a localhost
coordinator (gloo CPU collectives, 4 devices each).
"""
import pytest

import json
import socket
import subprocess
import sys
from pathlib import Path


pytestmark = pytest.mark.slow  # see pytest.ini: excluded from the quick gate
REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_train_entry_multihost_two_processes(tmp_path):
    port = _free_port()
    outdir = tmp_path / "run"
    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, str(REPO / "train.py"),
            "--config-name", "smoke", "--cpu",
            "training.multihost=true",
            f"training.coordinator_address=127.0.0.1:{port}",
            "training.num_processes=2",
            f"training.process_id={pid}",
            "training.cpu_devices=4",
            # per-process rows: global batch = 2x4 = 8 == the data-axis size
            # (global batch must divide over the 8-device data axis)
            "training.per_device_train_batch_size=4",
            "training.per_device_eval_batch_size=4",
            "training.max_steps=2",
            "training.gradient_accumulation_steps=1",
            "training.eval_steps=100",
            "training.save_steps=1",
            f"training.output_dir={outdir}",
        ]
        procs.append(
            subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, cwd=str(REPO),
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"

    # the process group really spanned both processes (8 global devices)
    assert any("process 0/2" in o and "4 local + 8 global devices" in o for o in outs), \
        outs[0][-1500:]

    # training ran and logged each step exactly once (primary-only writer)
    rows = [json.loads(l) for l in (outdir / "train_log.jsonl").open()]
    steps = [r["step"] for r in rows if "loss" in r]
    assert sorted(set(steps)) == [1, 2]
    assert len(steps) == len(set(steps))

    # primary-only artifacts: results json + final model written once
    assert (outdir / "train_results.json").exists()
    assert (outdir / "model").exists()
    # checkpoints came from the multi-process Orbax path
    assert any(p.name.isdigit() for p in (outdir / "checkpoints").iterdir())
