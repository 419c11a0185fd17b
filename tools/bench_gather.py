"""Hypercolumn sampling shoot-out: gather vs bilinear one-hot matmul.

The sampling segment costs +2.3 ms fwd+bwd at 512px (tools/profile_step)
and is a large share of the ~2.3 ms coarse-scale step floor, where the
solver spends 600 of its 800 steps. The shipped path is one fused
4-corner gather per map (ops/sampling.bilinear_gather) whose VJP is a
scatter-add. TPU has no native gather hardware — XLA lowers these to
slow dynamic-slice loops — but it has an MXU: a bilinear lookup is a
sparse (n, P) matrix with 4 weighted entries per row applied to the
(P, C) flattened map, and its VJP is the transposed matmul. This times
both formulations per scale on the full 10-map hypercolumn.

    python tools/bench_gather.py [--scales 64,128,256,512]
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


def _sync(out):
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timed(run, args, steps, reps=3):
    out = run(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / steps * 1000.0)
    return best


def make_feats(h, w, dtype, rng):
    """Image + 9 VGG16 tap shapes at base resolution (h, w)."""
    plan = [(3, 1, jnp.float32), (64, 1, jnp.float32), (64, 1, jnp.float32),
            (128, 2, dtype), (128, 2, dtype),
            (256, 4, dtype), (256, 4, dtype),
            (512, 8, dtype), (512, 8, dtype), (512, 16, dtype)]
    feats = []
    for c, s, dt in plan:
        feats.append(jnp.asarray(
            rng.standard_normal((-(-h // s), -(-w // s), c)), dt))
    return feats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=str, default="64,512")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--variants", type=str, default="")
    ap.add_argument("--check", action="store_true",
                    help="also run the f32 numerics check (2 extra "
                         "compiles; covered by tests/test_sampling.py)")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu.solve import resize_max_hw
    from strotss_tpu.ops import sampling

    rng = np.random.default_rng(0)
    n = 1024

    for scale in [int(s) for s in args.scales.split(",")]:
        h, w = resize_max_hw(321, 481, scale)
        feats = make_feats(h, w, jnp.bfloat16, rng)
        # pred = what the solver differentiates; content side is fwd-only
        pred = [jnp.asarray(rng.standard_normal(f.shape), f.dtype)
                for f in feats]

        def body_of(sample_fn):
            def body(carry, k):
                coords = sampling.strided_grid_coords(k, (h, w), n)

                def loss(p):
                    gx = sample_fn(feats, coords)   # content side, fwd only
                    gp = sample_fn(p, coords)
                    return jnp.sum((gp - gx) ** 2)

                g = jax.grad(loss)(carry)
                return jax.tree_util.tree_map(
                    lambda a, b: a + 0.01 * b.astype(a.dtype), carry, g), None
            return body

        def run_of(sample_fn):
            @jax.jit
            def run(pred, keys):
                out, _ = jax.lax.scan(body_of(sample_fn), pred, keys)
                return out
            return run

        keys = jax.random.split(jax.random.PRNGKey(0), args.steps)

        variants = {
            "gather": lambda fs, c: sampling.sample_hypercolumn(
                fs, c, matmul_px=0),
            "onehot": lambda fs, c: sampling.sample_hypercolumn_matmul(fs, c),
        }
        if args.variants:
            keep = args.variants.split(",")
            variants = {k: v for k, v in variants.items() if k in keep}
        row = {"scale": scale}
        print(f"# scale {scale}: lowering {len(variants)} variants",
              flush=True)
        if args.check:
            # numerics check (f32 maps so the comparison is exact-ish)
            f32feats = [f.astype(jnp.float32) for f in feats]
            coords = sampling.strided_grid_coords(
                jax.random.PRNGKey(1), (h, w), n)
            want = np.asarray(jax.jit(variants["gather"])(f32feats, coords))
            got = np.asarray(jax.jit(variants["onehot"])(f32feats, coords))
            row["onehot_max_rel_err"] = round(
                float(np.abs(want - got).max() /
                      max(1e-9, np.abs(want).max())), 7)
        for name, fn in variants.items():
            try:
                row[f"{name}_ms"] = round(
                    timed(run_of(fn), (pred, keys), args.steps), 3)
            except Exception as e:
                row[f"{name}_ms"] = (f"{type(e).__name__}: "
                                     f"{str(e).splitlines()[0][:120]}")
            print(f"#   {name}: {row[f'{name}_ms']}", flush=True)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
