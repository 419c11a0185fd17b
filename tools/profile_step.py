"""Ablation profile of one optimization step at a given scale.

Times jitted sub-graphs of the train step (VGG forward, VGG fwd+bwd,
sampling gathers, each loss term with gradients, full step) so the step-time
budget is attributable without a trace viewer. Run on the real TPU:

    python tools/profile_step.py --scale 512 [--samples 1024]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/strotss_tpu/jaxcache"))

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # axon's block_until_ready can return before execution completes;
    # only a host fetch truly waits (CLAUDE.md relay notes)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timed(fn, *args, reps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1000.0  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=512)
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import load_vgg_params
    from strotss_tpu.ops import losses as L
    from strotss_tpu.ops.image import fold_laplacian_pyramid
    from strotss_tpu.ops.sampling import sample_paired
    from strotss_tpu.solve import (
        _extract_j,
        _scale_init_j,
        _style_targets_j,
        extract_hypercolumn,
        resize_max_hw,
        spec_from_config,
    )

    cfg = StrotssConfig(compute_dtype=args.dtype, sample_size=args.samples)
    spec = spec_from_config(cfg)
    params = load_vgg_params()
    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.random((1, 321, 481, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 400, 300, 3)), jnp.float32)
    chw = resize_max_hw(321, 481, args.scale)
    shw = resize_max_hw(400, 300, args.scale)
    scl_c, scl_s, pyramid = _scale_init_j(
        "first", chw, shw, cfg.pyramid_levels, content, style, content
    )
    cf = _extract_j(spec, params, scl_c)
    sf = _extract_j(spec, params, scl_s)
    key = jax.random.PRNGKey(0)
    target = _style_targets_j(spec, key, sf)

    print(f"scale={args.scale} -> content {chw}, samples={args.samples}, "
          f"dtype={args.dtype}")

    # --- VGG forward ------------------------------------------------------
    fwd = jax.jit(lambda img: extract_hypercolumn(spec, params, img)[-1])
    print(f"vgg fwd:              {timed(fwd, scl_c):8.2f} ms")

    # --- VGG fwd+bwd through the pyramid fold ------------------------------
    def vgg_fb(pyr):
        img = fold_laplacian_pyramid(pyr)
        feats = extract_hypercolumn(spec, params, img)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    g_vgg = jax.jit(jax.grad(vgg_fb))
    print(f"vgg fwd+bwd:          {timed(g_vgg, pyramid):8.2f} ms")

    # --- sampling gathers (fwd+bwd) ----------------------------------------
    def samp(pyr, k):
        img = fold_laplacian_pyramid(pyr)
        pred = extract_hypercolumn(spec, params, img)
        c, p = sample_paired(k, cf, pred, spec.sample_size)
        return jnp.sum(c) + jnp.sum(p)

    g_samp = jax.jit(jax.grad(samp))
    print(f"+ sampling fwd+bwd:   {timed(g_samp, pyramid, key):8.2f} ms")

    # --- individual loss terms on fixed sampled features -------------------
    cfeat, pfeat = jax.jit(
        lambda k: sample_paired(k, cf, [f for f in cf], spec.sample_size)
    )(key)
    for name, fn in {
        "self_similarity": lambda p: L.content_loss(cfeat, p),
        "moment_matching": lambda p: L.moment_matching(target, p),
        "remd_xla": lambda p: L.relaxed_emd(target, p, "cosine", impl="xla"),
        "remd_pallas": lambda p: L.relaxed_emd(target, p, "cosine",
                                               impl="pallas"),
        "remd_palette_xla": lambda p: L.relaxed_emd(
            L.rgb_to_yuv(target), L.rgb_to_yuv(p), "both", impl="xla"),
    }.items():
        g = jax.jit(jax.grad(fn))
        print(f"{name + ' grad:':22s}{timed(g, pfeat):8.2f} ms")

    # --- full train step ----------------------------------------------------
    from strotss_tpu.solve import init_opt_state, run_chunk

    opt_state = init_opt_state(cfg.lr, pyramid)
    alpha = jnp.float32(16.0)
    lrt = jnp.float32(cfg.lr)

    def one_chunk(pyr, ostate, k):
        return run_chunk(spec, 10, params, cf, target, None,
                         pyr, ostate, k, alpha, lrt)

    # donation: time with fresh state each reps — use n_steps=10 and divide
    state = (pyramid, opt_state, key)
    out = one_chunk(*state)
    _sync(out[0])
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = one_chunk(*out[:3])
    _sync(out[0])
    ms = (time.perf_counter() - t0) / (reps * 10) * 1000.0
    print(f"full step (in scan):  {ms:8.2f} ms")


if __name__ == "__main__":
    main()
