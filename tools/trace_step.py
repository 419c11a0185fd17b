"""Capture an on-device profiler trace + FLOP accounting of the hot step.

VERDICT r2 item 4: the 512px step runs the conv stack at low MXU
utilization by micro-benchmark estimates, but tunnel micro-benchmarks are
noisy — this tool produces the noise-free evidence:

1. ``jax.profiler`` trace of a few ``run_chunk`` executions (if the
   backend supports device tracing) → ``--out`` directory, view offline.
2. Analytic FLOP accounting of the step body (conv + loss-matmul MACs,
   backward counted as dgrad-only since VGG weights are frozen), divided
   by the measured amortized step time → achieved FLOP/s and hence MXU
   utilization (no profiler needed, relay-safe).

   ``Compiled.cost_analysis()`` is NOT used for the numerator: on this
   backend it counts the ``lax.scan`` body once rather than xN, so it
   under-reports the program by the chunk length (measured 5.78 GFLOP for
   a 50-step chunk whose body alone is >200 GFLOP).

    python tools/trace_step.py --scale 512 [--out /tmp/strotss_trace]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/strotss_tpu/jaxcache"))

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# bf16 peak per v5e chip (jax.devices()[0].device_kind == "TPU v5 lite");
# f32 ops on the MXU run as multi-pass bf16 so the bf16 peak stays the
# right denominator for utilization accounting
V5E_PEAK_FLOPS = 197e12

# VGG16 conv plan: (out_channels, convs_in_block); 2x2/2 pool after each
# block. All convs 3x3 SAME. Deepest tap is block5_conv3 = all 13 convs.
_VGG16_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


def vgg_flops(h, w, blocks=_VGG16_BLOCKS):
    """Analytic forward conv FLOPs (2*MACs) for VGG16 through block5_conv3."""
    total = 0.0
    cin = 3
    for cout, n_convs in blocks:
        for _ in range(n_convs):
            total += 2.0 * h * w * cin * cout * 9
            cin = cout
        h, w = h // 2, w // 2  # 2x2/2 maxpool, VALID
    return total


def step_flops(h, w, n, c_total=2179):
    """Analytic FLOPs of one optimization step (matmul/conv MACs only).

    VGG weights are frozen → backward is dgrad-only (1x fwd per conv; the
    wgrad convs are dead code). Loss matmuls: self-similarity builds two
    NxN cosine Grams (content's from freshly-gathered rows each step, so
    it cannot be hoisted) but only the prediction side is differentiated;
    moment matching builds the prediction's CxC covariance (target side
    hoisted, solve.py style_target_moments); REMD builds one NxN cosine
    cost (target fixed → cotangent flows to prediction only). Gathers,
    pyramid fold, RMSprop, and the C=3 palette REMD are negligible FLOPs.
    """
    vgg_fwd = vgg_flops(h, w)
    vgg_bwd = vgg_fwd  # dgrad only
    gram = 2.0 * n * n * c_total         # one NxN Gram from (N,C)x(C,N)
    cov = 2.0 * n * c_total * c_total    # one CxC covariance from (C,N)x(N,C)
    selfsim = 2 * gram + 2 * gram        # fwd: pred+content Grams; bwd: pred
    moments = cov + 2 * cov              # fwd + bwd (two matmuls)
    remd = gram + gram                   # fwd cost + bwd to prediction
    return vgg_fwd + vgg_bwd + selfsim + moments + remd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=512)
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", type=str, default=None,
                    help="profiler trace output dir (skipped if unset)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import load_vgg_params
    from strotss_tpu.solve import (
        _extract_j,
        _scale_init_j,
        _style_targets_j,
        init_opt_state,
        resize_max_hw,
        run_chunk,
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
    opt_state = init_opt_state(cfg.lr, pyramid)
    alpha = jnp.float32(16.0)
    lrt = jnp.float32(cfg.lr)

    n = args.steps

    def chunk(pyr, ostate, k):
        return run_chunk(spec, n, params, cf, target, None,
                         pyr, ostate, k, alpha, lrt)

    def sync(o):
        # axon's block_until_ready returns before execution completes;
        # only a host fetch truly waits (CLAUDE.md relay notes)
        jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    out = chunk(pyramid, opt_state, key)
    sync(out[0])

    # --- analytic FLOP accounting (see step_flops docstring) -------------
    c_total = 3 + sum(int(f.shape[-1]) for f in cf[1:])
    flops_per_step = step_flops(chw[0], chw[1], args.samples, c_total)

    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chunk(*out[:3])
    sync(out[0])
    step_ms = (time.perf_counter() - t0) / (reps * n) * 1000.0

    achieved = flops_per_step / (step_ms / 1000.0)
    result = {
        "scale": args.scale,
        "content_hw": list(chw),
        "dtype": args.dtype,
        "samples": args.samples,
        "step_ms": round(step_ms, 3),
        "analytic_gflops_per_step": round(flops_per_step / 1e9, 2),
        "vgg_fwd_gflops": round(vgg_flops(chw[0], chw[1]) / 1e9, 2),
        "achieved_tflops": round(achieved / 1e12, 2),
        "mxu_utilization_vs_bf16_peak": round(achieved / V5E_PEAK_FLOPS, 4),
    }
    print(json.dumps(result, indent=2))

    # --- optional device trace ------------------------------------------
    if args.out:
        try:
            jax.profiler.start_trace(args.out)
            out = chunk(*out[:3])
            jax.block_until_ready(out[0])
            jax.profiler.stop_trace()
            print(f"# trace written to {args.out}", file=sys.stderr)
        except Exception as e:
            print(f"# device trace unavailable: {type(e).__name__}: {e}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
