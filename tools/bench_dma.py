"""Pallas DMA bandwidth vs block shape/layout on real TPU.

The anatomy bench shows the fused local kernel is ~92% DMA at ~160GB/s
effective. This measures pure copy kernels to find which block geometries
saturate HBM:

  flat2d     - (M, 512) array, block (rows, 512): fully contiguous chunks
  headmajor  - (bg, hg, L, D) array, block (1, hg, bq, D): hg strided chunks
               of bq*D*2 bytes each (the attention kernels' geometry)
  headminor  - (bg, L, hg*D) array, block (1, bq, hg*D): one contiguous chunk

Also times an XLA elementwise pass over the same bytes as the HBM roofline
reference.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cm3p_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

BG, HG, L, D = 192, 4, 4096, 64  # the local kernel's geometry at B64
CHAIN = 4


def timed(fn, *args, iters=3):
    out = fn(*args)
    np.asarray(out.ravel()[:8])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(*args).ravel()[:8])
    return (time.perf_counter() - t0) / iters / CHAIN


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def bench_flat2d(rows_per_block):
    M = BG * HG * L  # same total bytes
    x = jnp.ones((M, D * 2), jnp.bfloat16)
    nb = M // rows_per_block

    def copy(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((rows_per_block, D * 2), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows_per_block, D * 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, D * 2), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        )(x)

    @jax.jit
    def run(x):
        y = x
        for _ in range(CHAIN):
            y = copy(y)
        return y

    t = timed(run, x)
    gb = M * D * 2 * 2 * 2 / 1e9  # read + write
    print(f"flat2d  block=({rows_per_block:5d},{D*2}) [{rows_per_block*D*4//1024:6d} KB]: {t*1e3:7.2f} ms  {gb/t:6.0f} GB/s")


def bench_headmajor(bq):
    x = jnp.ones((BG, HG, L, D), jnp.bfloat16)
    nq = L // bq

    def copy(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(BG, nq),
            in_specs=[pl.BlockSpec((1, HG, bq, D), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, HG, bq, D), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BG, HG, L, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
        )(x)

    @jax.jit
    def run(x):
        y = x
        for _ in range(CHAIN):
            y = copy(y)
        return y

    t = timed(run, x)
    gb = BG * HG * L * D * 2 * 2 / 1e9
    print(f"headmaj block=(1,{HG},{bq:4d},{D}) [{HG*bq*D*2//1024:6d} KB, {HG} chunks]: {t*1e3:7.2f} ms  {gb/t:6.0f} GB/s")


def bench_headminor(bq):
    x = jnp.ones((BG, L, HG * D), jnp.bfloat16)
    nq = L // bq

    def copy(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(BG, nq),
            in_specs=[pl.BlockSpec((1, bq, HG * D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, bq, HG * D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BG, L, HG * D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
        )(x)

    @jax.jit
    def run(x):
        y = x
        for _ in range(CHAIN):
            y = copy(y)
        return y

    t = timed(run, x)
    gb = BG * L * HG * D * 2 * 2 / 1e9
    print(f"headmin block=(1,{bq:4d},{HG*D}) [{bq*HG*D*2//1024:6d} KB, 1 chunk ]: {t*1e3:7.2f} ms  {gb/t:6.0f} GB/s")


def main():
    x = jnp.ones((BG, HG, L, D), jnp.bfloat16)

    @jax.jit
    def xla_pass(x):
        y = x
        for _ in range(CHAIN):
            y = y * 1.000001
        return y

    t = timed(xla_pass, x)
    gb = BG * HG * L * D * 2 * 2 / 1e9
    print(f"XLA elementwise pass                      : {t*1e3:7.2f} ms  {gb/t:6.0f} GB/s")

    for rows in (256, 1024, 4096):
        bench_flat2d(rows)
    for bq in (256, 1024, 4096):
        bench_headmajor(bq)
    for bq in (256, 1024, 4096):
        bench_headminor(bq)


if __name__ == "__main__":
    main()
