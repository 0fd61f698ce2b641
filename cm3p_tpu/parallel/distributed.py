"""Multi-host (TPU pod) process management.

The reference is single-node: HF Trainer + torch.distributed DDP under
torchrun (``train.py:198-201``). The TPU-native equivalent (SURVEY.md §2.5
"Distributed comm backend") is ``jax.distributed.initialize`` plus the same
`(data, model)` mesh spanning all pod devices — XLA collectives then ride
ICI within a slice and DCN across slices with no further code changes.

Single-process runs (the common case, and every test) hit only no-op paths,
so this module adds zero overhead and zero new dependencies there.
"""
from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    heartbeat_timeout_seconds: Optional[int] = None,
) -> None:
    """Initialize JAX's multi-process runtime (idempotent).

    On Cloud TPU pods all three arguments are auto-detected from the
    metadata server — call with no arguments. For manual clusters pass the
    coordinator address (``host:port``) plus this process's id and count.

    ``heartbeat_timeout_seconds`` bounds FAILURE DETECTION: when a peer
    process dies without a clean shutdown (preempted VM, OOM-killed worker),
    the coordination service notices missed heartbeats within this window
    and aborts the survivors with a clear error instead of letting them
    hang in a collective until a pod-scheduler timeout. None keeps jax's
    default (100 s); tests/test_mp_preemption.py proves the bound.
    """
    global _initialized
    import jax

    if _initialized:
        return
    kwargs = {}
    if heartbeat_timeout_seconds is not None:
        kwargs["heartbeat_timeout_seconds"] = heartbeat_timeout_seconds
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should own logging / wandb / result files.

    Orbax checkpointing must still be called from EVERY process (it
    coordinates internally); only human-facing side effects are gated.
    """
    return process_index() == 0


def all_processes_have(local_have: bool) -> bool:
    """True iff EVERY process reports ``local_have`` truthy.

    The guard that makes per-host batch-count skew safe: ``put_global_batch``
    and every collective step require all hosts to participate, but strided
    data shards (``MmrsDataset.get_sharded_metadata``) yield per-host counts
    that differ by one whenever rows don't divide evenly — without agreement
    the host with more batches enters a collective the exhausted host never
    joins and the pod hangs. Call this with "I have a next batch" before each
    collectively-executed eval step; if any host is exhausted, all stop
    together. Single-process: a no-op returning ``local_have``.
    """
    import jax

    if jax.process_count() == 1:
        return bool(local_have)
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray(bool(local_have), np.int32))
    return bool(np.min(flags))


def data_shard_group(mesh, axis: str = "data") -> tuple[int, int]:
    """This process's (group_index, num_groups) along the mesh data axis.

    When the model (TP) axis spans processes, several processes' devices
    cover the SAME block of data-axis rows — those processes form one data
    group and must feed IDENTICAL local batch rows (their devices hold the
    same batch shard, split along the model axis). With TP inside a single
    process (the common pod layout) every process is its own group and this
    degenerates to (process_index-ordered group, process_count).

    The data pipeline must shard by GROUP, not by process: slicing by raw
    ``process_index`` on a TP-spanning-process mesh feeds different rows to
    the model columns of one data shard — activations inside every layer
    matmul disagree and training is silently wrong. Found by the 8-process
    x 1-device cluster leg (tests/test_mp_cluster_8p.py).
    """
    import jax
    import numpy as np

    dev = np.asarray(mesh.devices)
    axis_num = list(mesh.axis_names).index(axis)
    rows = np.moveaxis(dev, axis_num, 0).reshape(dev.shape[axis_num], -1)
    owners = [frozenset(d.process_index for d in row) for row in rows]
    groups: list = []
    for s in owners:
        if s not in groups:
            groups.append(s)
    pid = jax.process_index()
    mine = [i for i, s in enumerate(groups) if pid in s]
    if len(mine) != 1:
        raise ValueError(
            f"process {pid} covers {len(mine)} data-axis blocks of mesh "
            f"{mesh.shape}; the data axis must map each process's devices "
            "to exactly one contiguous block for per-host batch feeding"
        )
    return mine[0], len(groups)


def put_global_batch(batch: dict, batch_shardings) -> dict:
    """Place a batch on the mesh, assembling across hosts when needed.

    Single-process: plain ``device_put`` (unchanged fast path). Multi-host:
    each process contributes its local rows and the result is a global
    jax.Array whose leading dim is ``local_rows * num_data_groups`` (see
    ``data_shard_group`` — processes sharing a data-axis block because TP
    spans them count once, and must feed identical rows). Every host must
    feed the SAME per-host batch shape; the data pipeline's group-sharding
    guarantees content is disjoint across groups and identical within one.
    """
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(batch, batch_shardings)

    leaves = jax.tree.leaves(batch_shardings)
    _, num_groups = data_shard_group(leaves[0].mesh)

    def _make(x, sharding):
        x = np.asarray(x)
        global_shape = (x.shape[0] * num_groups,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(_make, batch, batch_shardings)
