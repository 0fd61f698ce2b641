"""Execute the multi-PROCESS distributed path on a localhost CPU cluster.

The reference's distributed story is single-node torch.distributed DDP
(reference ``train.py:198-201``, ``utils/muon_utils.py:131-136``) and ships
untested. Here the same artifact the TPU-pod path uses —
``cm3p_tpu/parallel/distributed.py`` (``jax.distributed.initialize``,
``put_global_batch``'s ``make_array_from_process_local_data`` branch,
primary-only logging, multi-process Orbax save/restore) — is EXECUTED by
spawning N real processes with a localhost coordinator and gloo CPU
collectives, running the real ``Trainer`` over a global (data, model) mesh.

Legs:

1. ``--processes N`` cluster run: N processes x (8/N) CPU devices each,
   global mesh 4x2, real train steps + eval + async Orbax saves.
2. resume leg: the cluster restarts with a higher ``--steps`` and must
   restore the multi-process checkpoint and continue.
3. ``--baseline``: the identical data stream on a single-process 8-device
   mesh; per-step losses must match the cluster run to fp tolerance.
4. ``--real-data``: the REAL host pipeline across the process boundary —
   builds an on-disk MMRS fixture (odd set count, audio on), runs the
   actual ``train.py`` entry (configs/train/smoke_mmrs.yaml: vocab
   population, MmrsDataset process sharding, multiprocess loader, packing
   collator) on the cluster, then a resume leg through the factory's
   ``start_step`` seek. The odd fixture makes per-host EVAL batch counts
   unequal, so the run also proves evaluate()'s skew truncation (the
   pod-hang guard, ``parallel/distributed.py:all_processes_have``) fires
   instead of deadlocking.

Writes a MULTICHIP-style JSON record (``--record``).

Usage:
    python tools/run_mp_cluster.py --processes 2 --steps 4 --resume-steps 6 \
        --baseline --record MULTICHIP_MP.json
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

GLOBAL_BSZ = 16
SEQ = 64


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# --------------------------------------------------------------------- worker


def worker_main(args) -> None:
    sys.path.insert(0, str(REPO))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8 // args.nproc)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if args.nproc > 1:
        from cm3p_tpu.parallel.distributed import initialize_distributed

        initialize_distributed(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.nproc,
            process_id=args.pid,
            heartbeat_timeout_seconds=args.heartbeat_timeout or None,
        )

    import numpy as np
    from cm3p_tpu.configs import tiny_cm3p_config
    from cm3p_tpu.models import CM3PModule
    from cm3p_tpu.train import Trainer, muon
    from cm3p_tpu.parallel.distributed import is_primary

    pid, nproc = args.pid, args.nproc

    # shard by data-axis GROUP (processes sharing a data block because TP
    # spans them must feed IDENTICAL rows — distributed.data_shard_group).
    # 2 procs x 4 devices: group == process (TP inside each process);
    # 8 procs x 1 device: 4 groups of 2 processes each (TP across the wire).
    if nproc == 1:
        gidx, ngroups = 0, 1
    else:
        from cm3p_tpu.parallel.distributed import data_shard_group
        from cm3p_tpu.parallel.mesh import make_mesh

        gidx, ngroups = data_shard_group(make_mesh(model=2))

    def factory():
        # deterministic GLOBAL stream: every process draws the same global
        # batch, then slices its group's rows — so the assembled global
        # array is identical for any process count (the parity basis)
        rng = np.random.default_rng(1234)
        local = GLOBAL_BSZ // ngroups

        def gen():
            for _ in range(1000):
                classes = np.ones((GLOBAL_BSZ, 3), np.int32)
                classes[:, 0] = 0
                b = {
                    "input_ids": rng.integers(0, 400, (GLOBAL_BSZ, SEQ)).astype(np.int32),
                    "attention_mask": np.ones((GLOBAL_BSZ, SEQ), np.int32),
                    "metadata_ids": rng.integers(0, 200, (GLOBAL_BSZ, 3, 12)).astype(np.int32),
                    "metadata_attention_mask": np.ones((GLOBAL_BSZ, 3, 12), np.int32),
                    "metadata_variation_classes": classes,
                }
                yield {k: v[gidx * local : (gidx + 1) * local] for k, v in b.items()}

        return gen()

    cfg = tiny_cm3p_config()
    model = CM3PModule(cfg)
    trainer = Trainer(
        model,
        muon(1e-3),
        factory,
        factory,
        output_dir=args.outdir,
        max_steps=args.steps,
        gradient_accumulation_steps=1,
        logging_steps=1,
        eval_steps=3,
        max_eval_batches=2,
        save_steps=2,
        model_axis=2,
    )
    start_step = trainer.ckpt.latest_step() or 0

    if args.kill_after_save_step:
        # multi-process preemption leg (a): SIGKILL THIS process the moment
        # it has initiated the async save — the coordinated multi-host Orbax
        # commit (per-process shard writes + commit barrier) dies in flight
        # on every process at once, like a preempted pod
        import os
        import signal

        real_save = trainer.ckpt.save
        kill_step = args.kill_after_save_step

        def killing_save(step, state, force=False):
            ok = real_save(step, state, force=force)
            if step == kill_step:
                os.kill(os.getpid(), signal.SIGKILL)
            return ok

        trainer.ckpt.save = killing_save

    state = trainer.train()
    trainer.close()
    if is_primary():
        (Path(args.outdir) / "worker_result.json").write_text(
            json.dumps(
                {
                    "final_step": int(state.step),
                    "resumed_from": int(start_step),
                    "process_count": nproc,
                    "devices_global": jax.device_count(),
                    "devices_local": jax.local_device_count(),
                }
            )
        )
    print(f"[{pid}] DONE step={int(state.step)}", flush=True)


# ------------------------------------------------------------ preempt legs


def _losses(outdir: Path) -> dict:
    log = outdir / "train_log.jsonl"
    if not log.exists():
        return {}
    rows = [json.loads(l) for l in log.open()]
    # duplicate steps after a resume: the post-resume row (written later) wins
    return {r["step"]: r["loss"] for r in rows if "loss" in r}


def _continuity(outdir: Path, ref_losses: dict, resumed_from: int, steps: int) -> bool:
    losses = _losses(outdir)
    for s in range(resumed_from + 1, steps + 1):
        if s not in losses or abs(losses[s] - ref_losses[s]) > 1e-6:
            return False
    return True


def preempt_legs(nproc: int, base: Path, steps: int = 6) -> dict:
    """Multi-process preemption (VERDICT r4 item 2).

    (a1) SIGKILL the WHOLE cluster from outside once a checkpoint has
         committed; restart must restore the multi-process checkpoint and
         continue bitwise vs an uninterrupted cluster run.
    (a2) every process SIGKILLs itself right after initiating an async save
         — the coordinated multi-host Orbax commit dies in flight; the
         restart must select a loadable checkpoint, never the partial one.
    (b)  SIGKILL ONE process only (first a non-coordinator, then the
         coordinator): the survivor must terminate with an error within the
         heartbeat bound instead of hanging in a collective forever (the
         failure mode a real preempted pod actually has). The reference has
         no story for any of this (cooperative resume only,
         /root/reference/train.py:204-223).
    """
    import os
    import signal

    record: dict = {"processes": nproc, "steps": steps}

    ref_dir = base / "ref"
    ref_dir.mkdir(parents=True, exist_ok=True)
    ref = run_cluster(nproc, steps, str(ref_dir))
    ref_losses = {r["step"]: r["loss"] for r in ref["log_rows"] if "loss" in r}
    record["reference_steps"] = sorted(ref_losses)

    # ---- (a1) external SIGKILL of every process once a ckpt committed
    a1 = base / "kill_committed"
    a1.mkdir(exist_ok=True)
    procs, logs = launch_cluster(nproc, steps, str(a1))
    ckpt_dir = a1 / "checkpoints"
    deadline = time.time() + 600
    killed = False
    while time.time() < deadline and not killed:
        if any(p.poll() is not None for p in procs):
            break
        committed = (
            [p for p in ckpt_dir.iterdir() if p.name.isdigit()] if ckpt_dir.exists() else []
        )
        if committed:
            for p in procs:
                try:
                    os.kill(p.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
            killed = True
        time.sleep(0.05)
    for p in procs:
        p.wait(timeout=60)
    for log in logs:
        log.close()
    r1 = run_cluster(nproc, steps, str(a1)) if killed else None
    record["kill_whole_cluster_committed"] = {
        "killed": killed,
        "resumed_from": r1 and r1["resumed_from"],
        "final_step": r1 and r1["final_step"],
        "continuity": bool(r1) and _continuity(a1, ref_losses, r1["resumed_from"], steps),
        "ok": bool(
            killed and r1 and r1["resumed_from"] >= 1 and r1["final_step"] == steps
            and _continuity(a1, ref_losses, r1["resumed_from"], steps)
        ),
    }

    # ---- (a2) self-SIGKILL on every process with the async save in flight
    a2 = base / "kill_mid_save"
    a2.mkdir(exist_ok=True)
    kill_step = steps - 2
    crash = run_cluster(
        nproc, steps, str(a2), timeout=600,
        extra=("--kill-after-save-step", str(kill_step), "--heartbeat-timeout", "10"),
        expect_fail=True,
    )
    r2 = run_cluster(nproc, steps, str(a2))
    record["kill_all_mid_async_save"] = {
        "crash_rcs": crash["rcs"],
        "resumed_from": r2["resumed_from"],
        "final_step": r2["final_step"],
        "continuity": _continuity(a2, ref_losses, r2["resumed_from"], steps),
        "ok": bool(
            r2["resumed_from"] <= kill_step and r2["final_step"] == steps
            and _continuity(a2, ref_losses, r2["resumed_from"], steps)
        ),
    }

    # ---- (b) kill ONE process; the survivor must fail fast, not hang
    for tag, victim in (("kill_nonprimary", nproc - 1), ("kill_coordinator", 0)):
        d = base / tag
        d.mkdir(exist_ok=True)
        procs, logs = launch_cluster(
            nproc, 10**6, str(d), extra=("--heartbeat-timeout", "10")
        )
        log_path = d / "train_log.jsonl"
        deadline = time.time() + 600
        underway = False
        while time.time() < deadline:
            if log_path.exists() and any("loss" in l for l in log_path.open()):
                underway = True
                break
            if any(p.poll() is not None for p in procs):
                break
            time.sleep(0.2)
        t_kill = time.time()
        survivor_rcs, within = [], None
        if underway:
            os.kill(procs[victim].pid, signal.SIGKILL)
            procs[victim].wait(timeout=60)
            survivors = [p for i, p in enumerate(procs) if i != victim]
            try:
                for p in survivors:
                    p.wait(timeout=max(1, 300 - (time.time() - t_kill)))
                within = round(time.time() - t_kill, 1)
                survivor_rcs = [p.returncode for p in survivors]
            except subprocess.TimeoutExpired:
                for p in procs:
                    try:
                        os.kill(p.pid, signal.SIGKILL)
                    except ProcessLookupError:
                        pass
                within = None
        for p in procs:
            try:
                p.wait(timeout=30)
            except subprocess.TimeoutExpired:
                pass
        for log in logs:
            log.close()
        record[tag] = {
            "underway": underway,
            "survivor_exit_s": within,
            "survivor_rcs": survivor_rcs,
            "ok": bool(
                underway and within is not None and within <= 300
                and all(rc != 0 for rc in survivor_rcs)
            ),
        }

    record["ok"] = all(
        record[k]["ok"]
        for k in (
            "kill_whole_cluster_committed",
            "kill_all_mid_async_save",
            "kill_nonprimary",
            "kill_coordinator",
        )
    )
    return record


# ------------------------------------------------------------- real-data leg

MINI_MAP = """osu file format v14

[General]
AudioFilename: audio.wav
Mode: 0

[Metadata]
Title:Cluster Track {i}
Creator:mapper_{i}
BeatmapID:{bid}
BeatmapSetID:{sid}

[Difficulty]
CircleSize:4
SliderMultiplier:1.0
HPDrainRate:5

[TimingPoints]
0,500,4,2,1,70,1,0

[HitObjects]
{objects}
"""


def build_mini_mmrs(root: Path, n_sets: int) -> None:
    """Small MMRS fixture: ``n_sets`` one-difficulty sets, ~18 s maps + WAVs."""
    import wave
    from datetime import datetime

    import numpy as np
    import pandas as pd

    rows = []
    statuses = [("ranked", 1), ("loved", 4), ("graveyard", -2)]
    for i in range(n_sets):
        sid, bid = 1000 + i, 5000 + i
        folder = f"set_{sid}"
        set_dir = root / "data" / folder
        set_dir.mkdir(parents=True, exist_ok=True)
        n = int(20.0 * 16000)
        data = (np.sin(np.linspace(0, 220.0 * (1 + 0.2 * i) * 2 * np.pi * 20.0, n)) * 0.3 * 32767).astype(np.int16)
        with wave.open(str(set_dir / "audio.wav"), "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            wf.writeframes(data.tobytes())
        objects = "\n".join(
            f"{(k * 37) % 512},{(k * 53) % 384},{k * 450},1,0,0:0:0:0:" for k in range(40)
        )
        fname = f"map_{bid}.osu"
        (set_dir / fname).write_text(MINI_MAP.format(i=i, bid=bid, sid=sid, objects=objects))
        rows.append(
            {
                "BeatmapSetId": sid,
                "Id": bid,
                "BeatmapSetFolder": folder,
                "BeatmapFile": fname,
                "AudioFile": "audio.wav",
                "ModeInt": 0,
                "Mode": "osu",
                "Cs": 3.0 + (i % 4),
                "Status": statuses[i % len(statuses)][0],
                "Ranked": statuses[i % len(statuses)][1],
                "UserId": 100 + i,
                "Creator": f"mapper_{i}",
                "SubmittedDate": datetime(2010 + (i % 10), 3, 1),
                "DifficultyRating": 2.0 + 0.5 * i,
                "StarRating": np.linspace(1.5, 4.5, 7),
                "TopTagIds": np.array([1 + (i % 5), 6 + (i % 7)]),
            }
        )
    pd.DataFrame(rows).to_parquet(root / "metadata.parquet")


def run_train_entry_cluster(
    nproc: int, steps: int, outdir: Path, mmrs_root: Path, port: int, timeout: int = 900
) -> list[str]:
    """Spawn ``train.py -cn smoke_mmrs`` on every cluster process; return logs."""
    procs = []
    for pid in range(nproc):
        cmd = [
            sys.executable, str(REPO / "train.py"),
            "--config-name", "smoke_mmrs", "--cpu",
            "training.multihost=true",
            f"training.coordinator_address=127.0.0.1:{port}",
            f"training.num_processes={nproc}",
            f"training.process_id={pid}",
            "training.cpu_devices=4",
            # global batch (rows x nproc) must divide the 8-way data axis
            "training.per_device_train_batch_size=4",
            "training.per_device_eval_batch_size=4",
            f"training.max_steps={steps}",
            f"dataset.train_dataset_paths=[{mmrs_root}]",
            f"dataset.test_dataset_paths=[{mmrs_root}]",
            f"training.output_dir={outdir}",
        ]
        procs.append(
            subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, cwd=str(REPO),
            )
        )
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        (outdir / f"entry_proc{pid}_s{steps}.log").write_text(out)
        if p.returncode != 0:
            raise RuntimeError(f"train.py process {pid} failed:\n{out[-4000:]}")
    return outs


def real_data_leg(nproc: int, base: Path, steps: int = 4, resume_steps: int = 6) -> dict:
    mmrs_root = base / "mmrs"
    if not (mmrs_root / "metadata.parquet").exists():
        # 9 sets: strided eval shards of 5 vs 4 sets across 2 processes —
        # DELIBERATELY unequal per-host eval batch counts
        build_mini_mmrs(mmrs_root, 9)
    outdir = base / "real_run"
    outdir.mkdir(parents=True, exist_ok=True)

    outs = run_train_entry_cluster(nproc, steps, outdir, mmrs_root, _free_port())
    rows = [json.loads(l) for l in (outdir / "train_log.jsonl").open()]
    train_steps = [r["step"] for r in rows if "loss" in r]
    eval_rows = [r for r in rows if any(k.startswith(("eval_", "final_eval_")) for k in r)]
    skew_truncated = any("truncating at batch" in o for o in outs)

    # resume leg: restart the same cluster with more steps — exercises the
    # MMRS factory's start_step seek + multi-process Orbax restore
    outs2 = run_train_entry_cluster(nproc, resume_steps, outdir, mmrs_root, _free_port())
    rows2 = [json.loads(l) for l in (outdir / "train_log.jsonl").open()]
    resumed = any("Resuming from checkpoint" in o for o in outs2)
    seek = any("resume seek" in o for o in outs2)
    steps_after = sorted({r["step"] for r in rows2 if "loss" in r})

    return {
        "processes": nproc,
        "fixture_sets": 9,
        "train_steps": sorted(set(train_steps)),
        "steps_logged_once": len(train_steps) == len(set(train_steps)),
        "eval_ran": bool(eval_rows),
        "eval_skew_truncated": skew_truncated,
        "resume": {"resumed": resumed, "seek_logged": seek, "steps": steps_after},
        "ok": bool(
            sorted(set(train_steps)) == list(range(1, steps + 1))
            and eval_rows
            and skew_truncated
            and resumed
            and seek
            and steps_after[-1] == resume_steps
        ),
    }


# --------------------------------------------------------------------- driver


def launch_cluster(nproc: int, steps: int, outdir: str, extra: tuple = ()) -> tuple:
    """Spawn the worker processes; return (procs, logs)."""
    port = _free_port()
    procs = []
    logs = []
    for pid in range(nproc):
        log = open(Path(outdir) / f"proc{pid}.log", "a")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    str(Path(__file__).resolve()),
                    "--worker",
                    "--pid",
                    str(pid),
                    "--nproc",
                    str(nproc),
                    "--port",
                    str(port),
                    "--steps",
                    str(steps),
                    "--outdir",
                    outdir,
                    *extra,
                ],
                stdout=log,
                stderr=subprocess.STDOUT,
                cwd=str(REPO),
            )
        )
    return procs, logs


def run_cluster(
    nproc: int, steps: int, outdir: str, timeout: int = 600,
    extra: tuple = (), expect_fail: bool = False,
) -> dict:
    procs, logs = launch_cluster(nproc, steps, outdir, extra)
    deadline = time.time() + timeout
    rcs = []
    for p in procs:
        rcs.append(p.wait(timeout=max(1, deadline - time.time())))
    for log in logs:
        log.close()
    if expect_fail:
        if not all(rcs):
            raise RuntimeError(f"expected the cluster to die, but rcs={rcs}")
        return {"rcs": rcs}
    if any(rcs):
        for pid in range(nproc):
            tail = (Path(outdir) / f"proc{pid}.log").read_text().splitlines()[-15:]
            print(f"--- proc{pid} tail ---\n" + "\n".join(tail), file=sys.stderr)
        raise RuntimeError(f"cluster run failed, rcs={rcs}")
    result = json.loads((Path(outdir) / "worker_result.json").read_text())
    result["log_rows"] = [
        json.loads(l) for l in open(Path(outdir) / "train_log.jsonl")
    ]
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=1)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--kill-after-save-step", type=int, default=0)
    ap.add_argument("--heartbeat-timeout", type=int, default=0,
                    help="failure-detection bound passed to jax.distributed (s)")
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--resume-steps", type=int, default=6)
    ap.add_argument("--baseline", action="store_true")
    ap.add_argument("--real-data", action="store_true",
                    help="run ONLY the real-data train.py leg (MMRS fixture)")
    ap.add_argument("--preempt", action="store_true",
                    help="run ONLY the multi-process preemption legs")
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--record", default=None)
    args = ap.parse_args()

    if args.worker:
        worker_main(args)
        return

    base = Path(args.outdir) if args.outdir else Path(tempfile.mkdtemp(prefix="mp_cluster_"))
    base.mkdir(parents=True, exist_ok=True)

    if args.preempt:
        t0 = time.time()
        rd = preempt_legs(args.processes, base)
        rd["wall_s"] = round(time.time() - t0, 1)
        if args.record:
            Path(args.record).write_text(json.dumps(rd, indent=2) + "\n")
        print(json.dumps(rd, indent=2))
        print(json.dumps({"ok": rd["ok"]}))
        if not rd["ok"]:
            sys.exit(1)
        return

    if args.real_data:
        t0 = time.time()
        rd = real_data_leg(args.processes, base, args.steps, args.resume_steps)
        rd["wall_s"] = round(time.time() - t0, 1)
        if args.record:
            Path(args.record).write_text(json.dumps(rd, indent=2) + "\n")
        print(json.dumps(rd, indent=2))
        print(json.dumps({"ok": rd["ok"]}))
        if not rd["ok"]:
            sys.exit(1)
        return

    record: dict = {"processes": args.processes, "global_batch": GLOBAL_BSZ, "mesh": "4x2 data x model"}

    t0 = time.time()
    mp_dir = base / f"run{args.processes}p"
    mp_dir.mkdir(exist_ok=True)
    mp = run_cluster(args.processes, args.steps, str(mp_dir))
    record["cluster"] = mp
    print(f"cluster {args.processes}p done in {time.time()-t0:.0f}s: "
          f"{mp['devices_global']} global devices, final step {mp['final_step']}")

    # resume leg: the same cluster restarts and must restore the
    # multi-process Orbax checkpoint written above
    rs = run_cluster(args.processes, args.resume_steps, str(mp_dir))
    record["resume"] = {
        "resumed_from": rs["resumed_from"],
        "final_step": rs["final_step"],
        "ok": rs["resumed_from"] == args.steps and rs["final_step"] == args.resume_steps,
    }
    print(f"resume leg: restored step {rs['resumed_from']} -> trained to {rs['final_step']}")

    if args.baseline:
        sp_dir = base / "run1p"
        sp_dir.mkdir(exist_ok=True)
        sp = run_cluster(1, args.steps, str(sp_dir))
        t_mp = {r["step"]: r["loss"] for r in mp["log_rows"] if "loss" in r}
        t_sp = {r["step"]: r["loss"] for r in sp["log_rows"] if "loss" in r}
        e_mp = {r["step"]: r["eval_loss"] for r in mp["log_rows"] if "eval_loss" in r}
        e_sp = {r["step"]: r["eval_loss"] for r in sp["log_rows"] if "eval_loss" in r}
        a_mp = {r["step"]: r["eval_accuracy_year"] for r in mp["log_rows"] if "eval_accuracy_year" in r}
        a_sp = {r["step"]: r["eval_accuracy_year"] for r in sp["log_rows"] if "eval_accuracy_year" in r}
        # the two runs must log the same steps — a missing step is a harness
        # failure and should say so, not surface as an opaque KeyError
        if set(t_mp) != set(t_sp):
            raise RuntimeError(
                f"baseline parity: cluster and single-process runs logged "
                f"different steps (cluster-only {sorted(set(t_mp) - set(t_sp))}, "
                f"baseline-only {sorted(set(t_sp) - set(t_mp))})"
            )
        record["baseline"] = {
            "train_loss_max_delta": max(abs(t_mp[s] - t_sp[s]) for s in t_sp),
            "eval_loss_max_delta": max((abs(e_mp[s] - e_sp[s]) for s in e_sp if s in e_mp), default=0.0),
            "zero_shot_accuracy_equal": a_mp == a_sp,
            "steps_compared": sorted(t_sp),
        }
        print(f"baseline parity: train max |Δloss| = {record['baseline']['train_loss_max_delta']:.3g}, "
              f"eval max |Δloss| = {record['baseline']['eval_loss_max_delta']:.3g}, "
              f"zero-shot equal = {record['baseline']['zero_shot_accuracy_equal']}")

    record["ok"] = record.get("resume", {}).get("ok", False) and (
        not args.baseline or record["baseline"]["train_loss_max_delta"] < 1e-3
    )
    if args.record:
        Path(args.record).write_text(json.dumps(record, indent=2) + "\n")
        print(f"record written to {args.record}")
    print(json.dumps({"ok": record["ok"]}))


if __name__ == "__main__":
    main()
