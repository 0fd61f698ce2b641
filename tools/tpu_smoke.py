"""Compile-and-run smoke of every production kernel variant on the real TPU.

CLAUDE.md documents that interpret-mode tests CANNOT catch Mosaic crashes
(mask-free variants, VMEM blowups, layout rules) — regressions used to
surface only in the headline bench. This tool compiles and executes every
(path x dtype x segments x rope x grad) combination the model can emit, in
one relay-batched process, and fails loudly.

Run BEFORE benching after any kernel change:
    python tools/tpu_smoke.py            # real TPU via the relay
    python tools/tpu_smoke.py --interpret  # CPU logic-only sanity
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The relay wraps EVERY compile failure — deterministic Mosaic crashes and
# transient relay/helper hiccups alike — in the same opaque message
# ("HTTP 500: tpu_compile_helper subprocess exit code 1"; the real cause only
# reaches the relay's own stderr). A one-off hiccup once aborted a whole
# multi-hour batch, so on this signature we retry once: deterministic
# failures just fail again (~30 s extra), transients recover.
_RETRYABLE = ("HTTP 500", "HTTP 502", "HTTP 503", "Connection refused",
              "Socket closed", "UNAVAILABLE")


def run_case(name, failures, fn, retries=1):
    """Run one smoke case; fn() returns True when outputs are finite."""
    t0 = time.perf_counter()
    attempt = 0
    while True:
        try:
            ok = fn()
            status = "PASS" if ok else "NONFINITE"
            if not ok:
                failures.append(name)
            print(f"{name:34s} {status}  ({time.perf_counter()-t0:5.1f}s)",
                  flush=True)
            return
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {str(e)[:100]}"
            if attempt < retries and any(m in str(e) for m in _RETRYABLE):
                attempt += 1
                print(f"{name:34s} RETRY {msg}", flush=True)
                time.sleep(15)
                continue
            failures.append(name)
            print(f"{name:34s} FAIL  {msg}", flush=True)
            return


def variants():
    """(name, call_kwargs, grad, shape) for every production codepath."""
    cases = []
    for dtype in ("bf16", "fp32"):
        for rope in (None, 10000.0):
            tag = f"{dtype}{' rope' if rope else ''}"
            # local fused, plain key mask
            cases.append((f"local w64 mask {tag}", dict(window=64, mask=True), False, dtype, rope))
            # local fused over packed segments
            cases.append((f"local w64 seg  {tag}", dict(window=64, seg=True), False, dtype, rope))
            # global over packed segments (seg-unrolled)
            cases.append((f"global seg     {tag}", dict(window=None, seg=True), False, dtype, rope))
            # global mask-free (synthesized all-ones segments guard)
            cases.append((f"global nomask  {tag}", dict(window=None), False, dtype, rope))
            # streaming windowed path (window too wide to fuse)
            cases.append((f"stream w300    {tag}", dict(window=300, mask=True), False, dtype, rope))
            # gradients through the fused backward kernels
            cases.append((f"local w64 GRAD {tag}", dict(window=64, seg=True), True, dtype, rope))
            cases.append((f"global seg GRAD {tag}", dict(window=None, seg=True), True, dtype, rope))
            if rope is not None:
                # trainable fused rope (CM3P_TRAIN_FUSED_ROPE): raw
                # residuals; backward kernels rotate on load and
                # counter-rotate dq/dk at finalize
                cases.append((f"local w64 TFRG {tag}", dict(window=64, seg=True, tfr=True), True, dtype, rope))
                cases.append((f"global seg TFRG {tag}", dict(window=None, seg=True, tfr=True), True, dtype, rope))
                cases.append((f"local w64 TFRG mask {tag}", dict(window=64, mask=True, tfr=True), True, dtype, rope))
            # Wo-epilogue fusion (out-projection + residual in-kernel;
            # no-grad primal — grads run the unfused composition anyway)
            cases.append((f"local w64 WO   {tag}", dict(window=64, seg=True, wo=True), False, dtype, rope))
            cases.append((f"global seg WO  {tag}", dict(window=None, seg=True, wo=True), False, dtype, rope))
            cases.append((f"global noma WO {tag}", dict(window=None, wo=True), False, dtype, rope))
        if dtype == "bf16":
            # int8 Wo epilogue (CM3P_FUSED_WO_Q; bf16 is the production path)
            cases.append(("local w64 WOQ  bf16", dict(window=64, seg=True, wo=True, woq=True), False, "bf16", None))
            cases.append(("global seg WOQ bf16", dict(window=None, seg=True, wo=True, woq=True), False, "bf16", None))
        # rectangular allgather-KV shape (SP path; never roped)
        cases.append((f"rect lq!=lk    {dtype}", dict(window=None, mask=True, rect=True), False, dtype, None))
    return cases


def ffn_variants():
    """(name, d_model, d_ff, dtype) for the fused LN+GeGLU FFN kernel at every
    tower shape the model can emit (beatmap 768/1152, audio 512/1024,
    metadata 256/512)."""
    import jax.numpy as jnp

    from cm3p_tpu.ops.fused_ffn import fusable

    cases = []
    for dtype in ("bf16", "fp32"):
        jt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        for d, f, tower in ((768, 1152, "beatmap"), (512, 1024, "audio"), (256, 512, "meta")):
            # mirror production gating (fp32 beatmap-shape weights crash
            # Mosaic and are gated off in fusable())
            if fusable(d, f, "gelu", False, False, jt):
                cases.append((f"ffn {tower} {d}/{f} {dtype}", d, f, dtype))
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("-B", type=int, default=2)
    ap.add_argument("-L", type=int, default=1024)
    ns = ap.parse_args()

    if ns.interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")
        import functools

        import jax.experimental.pallas as pl

        pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)
    import jax
    import jax.numpy as jnp

    from cm3p_tpu.ops.flash_attention import flash_attention
    from cm3p_tpu.utils.cache import enable_compilation_cache

    if not ns.interpret:
        enable_compilation_cache()

    B, L, H, D = ns.B, ns.L, 12, 64  # production head count/dim — Mosaic cares
    rng = np.random.default_rng(0)
    qkv32 = [rng.standard_normal((B, L, H, D)).astype(np.float32) * 0.3 for _ in range(3)]
    mask_np = np.ones((B, L), np.int32)
    mask_np[:, -100:] = 0
    seg_np = np.zeros((B, L), np.int32)
    pos = 0
    s = 1
    while pos < L - 50:
        ln = int(rng.integers(150, 400))
        seg_np[:, pos:pos + ln] = s
        pos += ln
        s += 1

    failures = []
    t_start = time.perf_counter()
    for name, kw, grad, dtype, rope in variants():
        jt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        q, k, v = (jnp.asarray(x, jt) for x in qkv32)
        call_kw = dict(window=kw.get("window"), rope_theta=rope)
        if kw.get("seg"):
            call_kw["segment_ids"] = jnp.asarray(seg_np)
        if kw.get("mask"):
            call_kw["key_mask"] = jnp.asarray(mask_np)
        if kw.get("rect"):
            k = k[:, : L // 2]
            v = v[:, : L // 2]
            call_kw["key_mask"] = jnp.asarray(mask_np[:, : L // 2])
        # wo/out_residual ride as jit ARGUMENTS, matching production where
        # they are traced params. Closing over them bakes the (768, 768)
        # weight as an XLA constant — an unrepresentative program that
        # crashed the relay's tpu_compile_helper on the fp32+rope+seg
        # combination (the argument form, like the production path and
        # tools/tpu_repro_wofp32.py, compiles fine).
        wo_args = ()
        if kw.get("wo"):
            wo_args = (
                jnp.asarray(rng.standard_normal((H * D, H * D)).astype(np.float32) * 0.05),
                jnp.asarray(rng.standard_normal((B, L, H * D)).astype(np.float32), jt),
            )
        import cm3p_tpu.ops.flash_attention as fa_mod

        fa_mod.FUSED_WO_Q = bool(kw.get("woq"))
        fa_mod.TRAIN_FUSED_ROPE = bool(kw.get("tfr"))

        def attn_case(q=q, k=k, v=v, call_kw=call_kw, grad=grad, wo_args=wo_args):
            def call(q, k, v, *wo_res):
                extra = dict(zip(("wo", "out_residual"), wo_res))
                return flash_attention(q, k, v, **call_kw, **extra)

            if grad:
                def loss(q, k, v, *wo_res):
                    return jnp.sum(call(q, k, v, *wo_res).astype(jnp.float32) ** 2)

                out = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v, *wo_args)
                vals = [float(np.asarray(jnp.sum(jnp.abs(o.astype(jnp.float32))))) for o in out]
                return all(np.isfinite(v_) for v_ in vals)
            out = jax.jit(call)(q, k, v, *wo_args)
            return bool(np.isfinite(float(np.asarray(jnp.sum(jnp.abs(out.astype(jnp.float32)))))))

        run_case(name, failures, attn_case)

    from cm3p_tpu.ops.fused_ffn import _pallas_ln_ffn
    from cm3p_tpu.ops.fused_ln_matmul import _pallas_ln_matmul, lnmm_fusable

    # fused LN->matmul(+residual): qkv and wo+residual at every tower width
    for dtype in ("bf16", "fp32"):
        jt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        for d, tower in ((768, "beatmap"), (512, "audio"), (256, "meta")):
            for n, kind in ((3 * d, "qkv"), (d, "wo+res")):
                if not lnmm_fusable(d, n, jt):
                    continue
                name = f"lnmm {tower} {kind} {dtype}"
                x = jnp.asarray(rng.standard_normal((B, L, d)).astype(np.float32) * 0.5, jt)
                scale = jnp.asarray(rng.uniform(0.5, 1.5, d).astype(np.float32))
                w = jnp.asarray(rng.standard_normal((d, n)).astype(np.float32) * 0.02)
                res = x if kind == "wo+res" else None
                with_ln = kind == "qkv"

                def lnmm_case(x=x, scale=scale, w=w, res=res, with_ln=with_ln):
                    out = jax.jit(
                        lambda x, s, w, r: _pallas_ln_matmul(
                            x, s, None, w, r, eps=1e-5, with_ln=with_ln
                        )
                    )(x, scale, w, res)
                    return bool(np.isfinite(float(np.asarray(jnp.sum(jnp.abs(out.astype(jnp.float32)))))))

                run_case(name, failures, lnmm_case)

    # W8A8: fused LN -> int8 quant -> int8 matmul (QKV shape) + the
    # residual Wo-side variant (CM3P_W8A8_WO attn out-projection), bf16 act
    from cm3p_tpu.ops.fused_ln_matmul import _pallas_ln_matmul_q, quantize_weight_int8

    for kind in ("qkv", "wo+res"):
        for d, tower in ((768, "beatmap"), (512, "audio"), (256, "meta")):
            name = f"lnmm-w8a8 {tower} {kind} bf16"
            n = 3 * d if kind == "qkv" else d
            x = jnp.asarray(rng.standard_normal((B, L, d)).astype(np.float32) * 0.5, jnp.bfloat16)
            scale = jnp.asarray(rng.uniform(0.5, 1.5, d).astype(np.float32))
            w = jnp.asarray(rng.standard_normal((d, n)).astype(np.float32) * 0.02)
            with_ln = kind == "qkv"
            res = None if with_ln else x

            def lnmm_q_case(x=x, scale=scale, w=w, res=res, with_ln=with_ln):
                def _q(x, s, w, r, _ln=with_ln):
                    wq, sw = quantize_weight_int8(w)
                    return _pallas_ln_matmul_q(x, s, None, wq, sw, r, eps=1e-5, with_ln=_ln)

                out = jax.jit(_q)(x, scale, w, res)
                return bool(np.isfinite(float(np.asarray(jnp.sum(jnp.abs(out.astype(jnp.float32)))))))

            run_case(name, failures, lnmm_q_case)

    for name, d, f, dtype in ffn_variants():
        jt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        x = jnp.asarray(rng.standard_normal((B, L, d)).astype(np.float32) * 0.5, jt)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, d).astype(np.float32))
        bias = jnp.zeros((d,), jnp.float32)
        wi = jnp.asarray(rng.standard_normal((d, 2 * f)).astype(np.float32) * 0.02)
        wo = jnp.asarray(rng.standard_normal((f, d)).astype(np.float32) * 0.02)

        def ffn_case(x=x, scale=scale, bias=bias, wi=wi, wo=wo):
            out = jax.jit(
                lambda x, s, b, wi, wo: _pallas_ln_ffn(
                    x, s, b, wi, wo, eps=1e-5, residual=True, block_rows=256
                )
            )(x, scale, bias, wi, wo)
            return bool(np.isfinite(float(np.asarray(jnp.sum(jnp.abs(out.astype(jnp.float32)))))))

        run_case(name, failures, ffn_case)

    # W8A8 FFN (int8 Wi; and the int8-Wo second stage), bf16 activations
    for wo_q in (False, True):
        for d, f, tower in ((768, 1152, "beatmap"), (512, 1024, "audio"), (256, 512, "meta")):
            name = f"ffn-w8a8{'+wo' if wo_q else ''} {tower} bf16"
            x = jnp.asarray(rng.standard_normal((B, L, d)).astype(np.float32) * 0.5, jnp.bfloat16)
            scale = jnp.asarray(rng.uniform(0.5, 1.5, d).astype(np.float32))
            bias = jnp.zeros((d,), jnp.float32)
            wi = jnp.asarray(rng.standard_normal((d, 2 * f)).astype(np.float32) * 0.02)
            wo = jnp.asarray(rng.standard_normal((f, d)).astype(np.float32) * 0.02)

            def ffn_q_case(x=x, scale=scale, bias=bias, wi=wi, wo=wo, wo_q=wo_q):
                out = jax.jit(
                    lambda x, s, b, wi, wo, _wq=wo_q: _pallas_ln_ffn(
                        x, s, b, wi, wo, eps=1e-5, residual=True, block_rows=256,
                        w8a8=True, w8a8_wo=_wq,
                    )
                )(x, scale, bias, wi, wo)
                return bool(np.isfinite(float(np.asarray(jnp.sum(jnp.abs(out.astype(jnp.float32)))))))

            run_case(name, failures, ffn_q_case)

    print(f"\n{len(failures)} failures / total {time.perf_counter()-t_start:.0f}s", flush=True)
    if failures:
        for f in failures:
            print("  FAILED:", f)
        sys.exit(1)


if __name__ == "__main__":
    main()
