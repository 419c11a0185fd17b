"""Capture an on-device profiler trace + FLOP accounting of the hot step.

VERDICT r2 item 4: the 512px step runs the conv stack at low MXU
utilization by micro-benchmark estimates, but tunnel micro-benchmarks are
noisy — this tool produces the noise-free evidence:

1. ``jax.profiler`` trace of a few ``run_chunk`` executions (if the
   backend supports device tracing) → ``--out`` directory, view offline.
2. ``Compiled.cost_analysis()`` FLOPs of the whole step program, divided
   by the measured amortized step time → a hard lower bound on achieved
   FLOP/s and hence MXU utilization (no profiler needed, relay-safe).

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

# bf16 peak per v5e chip; f32 ops on the MXU run as multi-pass bf16 so the
# bf16 peak stays the right denominator for utilization accounting
V5E_PEAK_FLOPS = 197e12


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

    out = chunk(pyramid, opt_state, key)
    jax.block_until_ready(out[0])

    # --- FLOP accounting off the compiled step program -------------------
    lowered = jax.jit(
        lambda p, o, k: run_chunk(spec, n, params, cf, target, None,
                                  p, o, k, alpha, lrt)
    ).lower(*out[:3])
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops_total = float(cost.get("flops", 0.0)) if cost else 0.0

    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chunk(*out[:3])
    jax.block_until_ready(out[0])
    step_ms = (time.perf_counter() - t0) / (reps * n) * 1000.0

    flops_per_step = flops_total / n
    achieved = flops_per_step / (step_ms / 1000.0)
    result = {
        "scale": args.scale,
        "dtype": args.dtype,
        "step_ms": round(step_ms, 3),
        "program_gflops_per_step": round(flops_per_step / 1e9, 2),
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
