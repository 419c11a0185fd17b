"""Maxpool formulation shoot-out (the block1→block2 boundary).

tools/profile_vgg.py attributed a 2.96 ms fwd+bwd delta to block2 at
512px — which includes pool1's backward at full resolution (the largest
pool in the net: 341×512×64 f32). The shipped pool is reshape+max
(vgg._maxpool), chosen over reduce_window because select-and-scatter is
catastrophically slow on TPU. This times the remaining candidates:

  reshape_max   x.reshape(n,h/2,2,w/2,2,c).max((2,4))   (shipped)
  strided_max   max of the 4 stride-2 slices — VJP is eq-compare +
                4 pad-interleaves instead of a 6-D reshape round-trip
  reduce_window lax.reduce_window (select-and-scatter VJP) — control

Each variant runs fwd (sum) and fwd+bwd (grad w.r.t. x) scan-amortized,
same methodology as tools/bench_block1.py.

    python tools/bench_pool.py [--scale 512]
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


def timed(fn, x, steps=30, reps=3, grad=False):
    ts = jnp.arange(1, steps + 1, dtype=jnp.float32)
    f = (lambda x: jnp.sum(fn(x))) if not grad else None

    @jax.jit
    def run(x, ts):
        def body(c, t):
            xi = x * (1.0 + 1e-3 * t)
            if grad:
                g = jax.grad(lambda v: jnp.sum(fn(v) * fn(v)))(xi)
                return c + jnp.mean(g), None
            return c + jnp.sum(fn(xi)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), ts)
        return c

    out = run(x, ts)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x, ts)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / steps * 1000.0)
    return best


def reshape_max(x):
    n, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2, :]
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))


def strided_max(x):
    n, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2, :]
    return jnp.maximum(
        jnp.maximum(x[:, 0::2, 0::2], x[:, 0::2, 1::2]),
        jnp.maximum(x[:, 1::2, 0::2], x[:, 1::2, 1::2]),
    )


def reduce_window(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=512)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu.solve import resize_max_hw

    h, w = resize_max_hw(321, 481, args.scale)
    rng = np.random.default_rng(0)
    # post-ReLU-like input: ~half exact zeros (tie-heavy for pool grads)
    x = jnp.asarray(
        np.maximum(rng.standard_normal((1, h, w, 64)), 0.0), jnp.float32)

    variants = {"reshape_max": reshape_max, "strided_max": strided_max,
                "reduce_window": reduce_window}
    want = np.asarray(jax.jit(reshape_max)(x))
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(x))
        assert np.array_equal(want, got), name

    print(f"# pool at (1, {h}, {w}, 64) f32", flush=True)
    for name, fn in variants.items():
        try:
            ms = timed(fn, x)
            msg = timed(fn, x, grad=True, steps=15)
            row = {"variant": name, "fwd_ms": round(ms, 3),
                   "fwd_bwd_ms": round(msg, 3)}
        except Exception as e:
            row = {"variant": name,
                   "error": f"{type(e).__name__}: "
                            f"{str(e).splitlines()[0][:160]}"}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
