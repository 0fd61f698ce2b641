"""Standalone trainer worker for the SIGKILL preemption tests.

Not a test module (no ``test_`` prefix): spawned as a subprocess by
tests/test_preemption.py so the parent can SIGKILL it mid-step, or so it can
SIGKILL itself microseconds after initiating an async checkpoint save
(``--kill-after-save-step``), leaving the write in flight.
"""
import argparse
import json
import os
import signal
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

BSZ, SEQ = 8, 64


def make_factory():
    def factory():
        # deterministic stream: batch index k is identical across runs, so a
        # resumed run's step k+1 loss must match the uninterrupted run's
        rng = np.random.default_rng(77)

        def gen():
            for _ in range(1000):
                classes = np.ones((BSZ, 3), np.int32)
                classes[:, 0] = 0
                yield {
                    "input_ids": rng.integers(0, 400, (BSZ, SEQ)).astype(np.int32),
                    "attention_mask": np.ones((BSZ, SEQ), np.int32),
                    "metadata_ids": rng.integers(0, 200, (BSZ, 3, 12)).astype(np.int32),
                    "metadata_attention_mask": np.ones((BSZ, 3, 12), np.int32),
                    "metadata_variation_classes": classes,
                }

        return gen()

    return factory


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--max-steps", type=int, default=5)
    ap.add_argument("--kill-after-save-step", type=int, default=None)
    args = ap.parse_args()

    from cm3p_tpu.configs import tiny_cm3p_config
    from cm3p_tpu.models import CM3PModule
    from cm3p_tpu.train import Trainer, muon

    model = CM3PModule(tiny_cm3p_config())
    trainer = Trainer(
        model,
        muon(1e-3),
        make_factory(),
        None,
        output_dir=args.outdir,
        max_steps=args.max_steps,
        gradient_accumulation_steps=1,
        logging_steps=1,
        eval_steps=10**9,
        save_steps=1,
        save_total_limit=10,
        model_axis=1,
    )
    resumed_from = trainer.ckpt.latest_step() or 0

    if args.kill_after_save_step is not None:
        real_save = trainer.ckpt.save
        kill_step = args.kill_after_save_step

        def killing_save(step, state, force=False):
            ok = real_save(step, state, force=force)
            if step == kill_step:
                # the async commit is in flight: SIGKILL all threads NOW,
                # before wait_until_finished could ever run
                os.kill(os.getpid(), signal.SIGKILL)
            return ok

        trainer.ckpt.save = killing_save

    state = trainer.train()
    trainer.close()
    print(json.dumps({"final_step": int(state.step), "resumed_from": resumed_from}), flush=True)


if __name__ == "__main__":
    main()
