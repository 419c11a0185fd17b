"""Per-block VGG timing ablation on the real TPU.

VERDICT r2 item 4 follow-through: the full-step accounting
(``tools/trace_step.py``) gives whole-step MXU utilization; this tool
locates WHERE the conv time goes. It times the VGG forward (and
forward+backward) truncated at each block boundary, differences
consecutive truncations to get per-block seconds, and compares each block
against its analytic FLOPs — a per-block MXU utilization table without a
device trace (the axon relay does not support ``jax.profiler`` device
tracing).

    python tools/profile_vgg.py --scale 512 [--dtype bfloat16]
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

V5E_PEAK_FLOPS = 197e12

# block-boundary taps and the conv plan (cout, n_convs) per block
_BOUNDARY_TAPS = ("block1_conv2", "block2_conv2", "block3_conv3",
                  "block4_conv3", "block5_conv3")
_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


def block_flops(h, w):
    """Analytic fwd FLOPs per block at input resolution (h, w)."""
    out = []
    cin = 3
    for cout, n_convs in _BLOCKS:
        total = 0.0
        for _ in range(n_convs):
            total += 2.0 * h * w * cin * cout * 9
            cin = cout
        out.append(total)
        h, w = h // 2, w // 2
    return out


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
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu.models.vgg import vgg_apply
    from strotss_tpu.models.weights import load_vgg_params
    from strotss_tpu.solve import resize_max_hw

    params = load_vgg_params()
    rng = np.random.default_rng(0)
    h, w = resize_max_hw(321, 481, args.scale)
    img = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    flops = block_flops(h, w)

    print(f"# scale={args.scale} -> ({h}, {w}), dtype={args.dtype}")
    rows = []
    prev_f, prev_fb = 0.0, 0.0
    for i, tap in enumerate(_BOUNDARY_TAPS):
        fwd = jax.jit(lambda x, tap=tap: vgg_apply(
            params, x, taps=(tap,), compute_dtype=dt)[0])

        def fb(x, tap=tap):
            o = vgg_apply(params, x, taps=(tap,), compute_dtype=dt)[0]
            return jnp.sum(o.astype(jnp.float32))

        gfb = jax.jit(jax.grad(fb))
        t_f = timed(fwd, img, reps=args.reps)
        t_fb = timed(gfb, img, reps=args.reps)
        d_f, d_fb = t_f - prev_f, t_fb - prev_fb
        prev_f, prev_fb = t_f, t_fb
        gf = flops[i] / 1e9
        # per-block fwd utilization from the differenced time
        util = (flops[i] / (d_f / 1e3)) / V5E_PEAK_FLOPS if d_f > 0 else 0.0
        row = {
            "block": i + 1, "through": tap,
            "fwd_ms": round(t_f, 2), "fwd_bwd_ms": round(t_fb, 2),
            "block_fwd_ms": round(d_f, 2), "block_fwd_bwd_ms": round(d_fb, 2),
            "block_gflops_fwd": round(gf, 1),
            "block_fwd_mxu": round(util, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
