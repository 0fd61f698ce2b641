"""Sequence-parallel attention (allgather-KV over a ``seq`` mesh axis).

The reference handles long inputs purely with data-level windowing and
local attention (SURVEY.md §5); max window length (≤4k tokens) fits one
chip comfortably. For contexts beyond that, this module shards the
*sequence* dimension across chips: queries stay local, keys/values are
all-gathered over ICI, and each chip runs the flash kernel on its query
shard — O(L/n) activation memory per chip with one tiled all-gather per
layer.

Global layers need no position bookkeeping (RoPE is applied before
sharding and the kernel is position-agnostic without a window); windowed
layers additionally pass the shard's absolute query offset so the sliding
window lines up. Use via ``shard_map`` or through
:func:`sequence_sharded_attention`, which wraps it.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _local_allgather_kv_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    seq_axis: str,
    window: Optional[int],
):
    """Runs inside shard_map: q local (B,Lloc,H,D), k/v gathered to full L."""
    from ..ops.flash_attention import flash_attention

    k_full = jax.lax.all_gather(k, seq_axis, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v, seq_axis, axis=1, tiled=True)
    mask_full = (
        jax.lax.all_gather(key_mask, seq_axis, axis=1, tiled=True) if key_mask is not None else None
    )

    if window is None:
        return flash_attention(q, k_full, v_full, key_mask=mask_full, window=None)

    # windowed: pad the local query block into its absolute position so the
    # kernel's |row - col| <= window test is global, then slice back out
    idx = jax.lax.axis_index(seq_axis)
    n = jax.lax.axis_size(seq_axis)
    l_loc = q.shape[1]
    l_full = l_loc * n
    q_full = jnp.zeros((q.shape[0], l_full) + q.shape[2:], q.dtype)
    q_full = jax.lax.dynamic_update_slice_in_dim(q_full, q, idx * l_loc, axis=1)
    out_full = flash_attention(q_full, k_full, v_full, key_mask=mask_full, window=window)
    return jax.lax.dynamic_slice_in_dim(out_full, idx * l_loc, l_loc, axis=1)


def sequence_sharded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    mesh: Mesh,
    seq_axis: str = "seq",
    window: Optional[int] = None,
) -> jnp.ndarray:
    """Attention over head-minor (B, L, H, D) with L sharded across ``seq_axis``."""
    from jax import shard_map

    qkv_spec = P(None, seq_axis, None, None)
    mask_spec = P(None, seq_axis)
    in_specs = (qkv_spec, qkv_spec, qkv_spec, mask_spec if key_mask is not None else P())
    fn = functools.partial(_local_allgather_kv_attention, seq_axis=seq_axis, window=window)
    sharded = shard_map(
        lambda q_, k_, v_, m_: fn(q_, k_, v_, m_ if key_mask is not None else None),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=qkv_spec,
        check_vma=False,
    )
    mask_arg = key_mask if key_mask is not None else jnp.zeros((), jnp.int32)
    return sharded(q, k, v, mask_arg)
