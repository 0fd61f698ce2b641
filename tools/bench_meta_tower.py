"""Localize the metadata-tower training cost (the grad_meta 0.30 s mystery).

tools/bench_train_decompose.py measured grad_meta = 0.301 s at the packed v8
shape — the 6-layer/256-hidden metadata tower (32 windows x 256 variations
x 24 tokens = 196k tokens) taking ~43% of the 0.696 s packed step despite
being ~3% of its FLOPs (analytic fwd+bwd floor ~4.6 TFLOP ≈ 50 ms at 50%
MXU). This tool ablates the tower into components, each separately jitted
over the SAME token population, so subtraction localizes the sink:

    fwd          get_metadata_features forward only
    grad         d(sum feats)/d params       — the decompose baseline
    grad_packG   meta_pack=G (XLA seg-bias route < 512 tokens/row,
                 segmented flash kernels >= 512)
    dense_grad   replica stack WITHOUT attention (same embed/LN/QKV/Wo/
                 GeGLU matmuls; v passes through where attention was)
    embed_grad   embedding + final norm + CLS pool + projection only
    grad_v64     grad at 64 variations        — batch-scaling anchor

Measured so far (v5e, 2026-08-18, V=256 -> 196k tokens): grad 0.233 s,
dense_grad 0.111-0.129 s => in-situ attention ~0.10-0.12 s for <3% of the
FLOPs. An isolated "attention-only chain" arm was removed after measuring
2.7-12.4 s: with no adjacent projection matmul, XLA has nothing to fuse
the (B,L,H,D)->(B,H,L,D) layout moves into and the arm times layout
thrash, not attention — in-situ cost must come from the grad-minus-dense
subtraction, not an isolated chain.

Relay-safe timing: host fetch per iteration (CLAUDE.md).

    python tools/bench_meta_tower.py [--variations 256] [--windows 32]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--windows", type=int, default=32, help="w_pad of the packed v8 shape")
    parser.add_argument("--variations", type=int, default=256)
    parser.add_argument("--meta-len", type=int, default=24)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--tiny", action="store_true", help="tiny shapes on CPU (plumbing smoke)")
    ns = parser.parse_args(argv)

    if ns.tiny:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from cm3p_tpu.configs import CM3PConfig, tiny_cm3p_config
    from cm3p_tpu.models import CM3PModule
    from cm3p_tpu.models.modernbert import ACTIVATIONS, LayerNormF32

    if ns.tiny:
        cfg = tiny_cm3p_config()
        ns.windows, ns.variations, ns.meta_len, ns.iters = 2, 4, 8, 1
    else:
        cfg = CM3PConfig()
    mcfg = cfg.metadata_config
    W, V, L = ns.windows, ns.variations, ns.meta_len
    H = mcfg.hidden_size

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, mcfg.vocab_size, (W, V, L)), jnp.int32)
    mask = jnp.ones((W, V, L), jnp.int32)

    model = CM3PModule(cfg, dtype=jnp.bfloat16, attn_impl="pallas")
    params = model.init(
        jax.random.PRNGKey(0),
        metadata_ids=ids[:1, :2],
        metadata_attention_mask=mask[:1, :2],
        method=CM3PModule.get_metadata_features,
    )["params"]

    def meta_feats(p, i, m):
        return model.apply(
            {"params": p}, metadata_ids=i, metadata_attention_mask=m,
            method=CM3PModule.get_metadata_features,
        )

    @jax.jit
    def fwd(p, i, m):
        return meta_feats(p, i, m).astype(jnp.float32).sum()

    @jax.jit
    def grad(p, i, m):
        return jax.grad(lambda q: meta_feats(q, i, m).astype(jnp.float32).sum())(p)

    # -- replica stack WITHOUT attention: identical embed/LN/dense matmuls,
    #    v slice of the fused QKV passes through where attention was --------
    class DenseOnlyTower(nn.Module):
        @nn.compact
        def __call__(self, ids2d):
            x = nn.Embed(mcfg.vocab_size, H, dtype=jnp.bfloat16, param_dtype=jnp.float32)(ids2d)
            x = LayerNormF32(mcfg.norm_eps, mcfg.norm_bias)(x)
            act = ACTIVATIONS[mcfg.hidden_activation]
            for i in range(mcfg.num_hidden_layers):
                h = LayerNormF32(mcfg.norm_eps, mcfg.norm_bias)(x)
                qkv = nn.Dense(3 * H, use_bias=False, dtype=jnp.bfloat16, param_dtype=jnp.float32)(h)
                v = qkv[..., 2 * H :]
                x = x + nn.Dense(H, use_bias=False, dtype=jnp.bfloat16, param_dtype=jnp.float32)(v)
                h = LayerNormF32(mcfg.norm_eps, mcfg.norm_bias)(x)
                g = nn.Dense(2 * mcfg.intermediate_size, use_bias=False, dtype=jnp.bfloat16, param_dtype=jnp.float32)(h)
                inp, gate = jnp.split(g, 2, axis=-1)
                x = x + nn.Dense(H, use_bias=False, dtype=jnp.bfloat16, param_dtype=jnp.float32)(act(inp) * gate)
            x = LayerNormF32(mcfg.norm_eps, mcfg.norm_bias)(x)
            return nn.Dense(cfg.projection_dim, use_bias=False, dtype=jnp.bfloat16, param_dtype=jnp.float32)(x[:, 0, :])

    ids2d = ids.reshape(-1, L)
    dense_tower = DenseOnlyTower()
    dense_params = dense_tower.init(jax.random.PRNGKey(1), ids2d[:8])["params"]

    @jax.jit
    def dense_grad(p, i):
        return jax.grad(lambda q: dense_tower.apply({"params": q}, i).astype(jnp.float32).sum())(p)

    # -- embedding + final norm + pool + projection only (no layers) -------
    class EmbedPool(nn.Module):
        @nn.compact
        def __call__(self, ids2d):
            x = nn.Embed(mcfg.vocab_size, H, dtype=jnp.bfloat16, param_dtype=jnp.float32)(ids2d)
            x = LayerNormF32(mcfg.norm_eps, mcfg.norm_bias)(x)
            x = LayerNormF32(mcfg.norm_eps, mcfg.norm_bias)(x)
            return nn.Dense(cfg.projection_dim, use_bias=False, dtype=jnp.bfloat16, param_dtype=jnp.float32)(x[:, 0, :])

    embed_pool = EmbedPool()
    embed_params = embed_pool.init(jax.random.PRNGKey(2), ids2d[:8])["params"]

    @jax.jit
    def embed_grad(p, i):
        return jax.grad(lambda q: embed_pool.apply({"params": q}, i).astype(jnp.float32).sum())(p)

    def time_fn(fn, *args):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(ns.iters):
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / ns.iters

    # -- meta_pack arms: same tower, G sequences packed per encoder row ----
    def make_pack_grad(g):
        # CPU (--tiny) can't run compiled Pallas; the xla fallback keeps the
        # plumbing smoke working while TPU measures the real kernel route
        impl = "pallas" if jax.default_backend() != "cpu" else "xla"
        m = CM3PModule(cfg, dtype=jnp.bfloat16, attn_impl=impl, meta_pack=g)

        @jax.jit
        def pack_grad(p, i, k):
            def loss(q):
                out = m.apply(
                    {"params": q}, metadata_ids=i, metadata_attention_mask=k,
                    method=CM3PModule.get_metadata_features,
                )
                return out.astype(jnp.float32).sum()

            return jax.grad(loss)(p)

        return pack_grad

    results = {}
    results["fwd"] = time_fn(fwd, params, ids, mask)
    print(f"fwd          {results['fwd']:.4f}s", flush=True)
    results["grad"] = time_fn(grad, params, ids, mask)
    print(f"grad         {results['grad']:.4f}s", flush=True)
    # g*L < 512 -> XLA dense seg-bias path; >= 512 -> segmented flash kernels
    for g in (4, 16, 32, 64):
        results[f"grad_pack{g}"] = time_fn(make_pack_grad(g), params, ids, mask)
        print(f"grad_pack{g:<4}{results[f'grad_pack{g}']:.4f}s", flush=True)
    results["dense_grad"] = time_fn(dense_grad, dense_params, ids2d)
    print(f"dense_grad   {results['dense_grad']:.4f}s", flush=True)
    results["embed_grad"] = time_fn(embed_grad, embed_params, ids2d)
    print(f"embed_grad   {results['embed_grad']:.4f}s", flush=True)
    v64 = max(V // 4, 1)
    results["grad_v64"] = time_fn(grad, params, ids[:, :v64], mask[:, :v64])
    print(f"grad_v64     {results['grad_v64']:.4f}s", flush=True)

    print(
        json.dumps(
            {
                "metric": "metadata_tower_decomposition",
                "unit": "s",
                "components": {k: round(v, 4) for k, v in results.items()},
                "derived": {
                    "dense_share_of_grad": round(results["dense_grad"] / results["grad"], 3),
                    "attn_in_situ": round(results["grad"] - results["dense_grad"], 4),
                },
                "detail": {
                    "windows": W,
                    "variations": V,
                    "meta_len": L,
                    "tokens": W * V * L,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
