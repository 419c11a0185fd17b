"""Attribute block1-kernel time to components (prep / kernel / fold).

First integration measured pallas block1 SLOWER than the XLA policy
(fwd 1.92 vs 1.23 ms, fwd+bwd 11.1 vs 2.7 ms at 512px). This times each
piece in isolation, scan-amortized like tools/bench_block1.py:

  im2col        x -> x27 (Hp, Wp, 27)
  strips_gather x27e[idx] fancy-index gather (the shipped path)
  strips_stack  jnp.stack of S static slices (candidate replacement)
  fwd_kernel    pallas fwd with prebuilt x27s
  bwd_prep      masks + pads + dz2 strips (gather)
  bwd_kernel    pallas bwd with prebuilt inputs
  fold27        dx27 -> dx

    python tools/bench_block1_parts.py [--scale 512]
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


def timed(fn, args, steps=30, reps=3):
    ts = jnp.arange(1, steps + 1, dtype=jnp.float32)

    @jax.jit
    def run(args, ts):
        def body(c, t):
            out = fn(*jax.tree_util.tree_map(
                lambda a: a * (1 + 1e-3 * t).astype(a.dtype), args))
            leaves = [jnp.sum(x.astype(jnp.float32)) for x in
                      jax.tree_util.tree_leaves(out)]
            return c + sum(leaves), None
        c, _ = jax.lax.scan(body, jnp.float32(0), ts)
        return c

    out = run(args, ts)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(args, ts)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / steps * 1000.0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=512)
    ap.add_argument("--rows", type=int, default=4)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu.models.weights import load_vgg_params
    from strotss_tpu.solve import resize_max_hw
    from strotss_tpu.ops.kernels import block1 as B

    params = load_vgg_params()
    k1 = jnp.asarray(params["block1_conv1"]["kernel"], jnp.float32)
    b1 = jnp.asarray(params["block1_conv1"]["bias"], jnp.float32)
    k2 = jnp.asarray(params["block1_conv2"]["kernel"], jnp.float32)
    b2 = jnp.asarray(params["block1_conv2"]["bias"], jnp.float32)
    rng = np.random.default_rng(0)
    H, W = resize_max_hw(321, 481, args.scale)
    R = args.rows
    Wp, S, Hp = B._geom(H, W, R)
    x = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    mul = jnp.bfloat16

    rows = {}

    rows["im2col"] = timed(
        lambda x: B._im2col(x, Hp, Wp).astype(mul), (x,))

    x27 = jax.jit(lambda x: B._im2col(x, Hp, Wp).astype(mul))(x)
    x27e = jnp.pad(x27, ((1, 1), (0, 0), (0, 0)))

    rows["strips_gather"] = timed(
        lambda a: B._strips(a, R), (x27e,))

    def strips_stack(a):
        return jnp.stack([
            jax.lax.dynamic_slice_in_dim(a, i * R, R + 2, 0)
            for i in range(S)]).reshape(S, (R + 2) * Wp, 27)

    rows["strips_stack"] = timed(strips_stack, (x27e,))

    x27s = jax.jit(lambda a: B._strips(a, R))(x27e)

    def fwd_kernel(x27s):
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        nr = (R + 2) * Wp
        kernel = functools.partial(
            B._fwd_kernel, H=H, W=W, Wp=Wp, R=R, mul_dtype=mul)
        full = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, nr, 27), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                full((27, 64)), full((1, 64)), full((9, 64, 64)),
                full((1, 64)),
            ],
            out_specs=(
                pl.BlockSpec((R, W, 64), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W, 64), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Hp, W, 64), jnp.float32),
                jax.ShapeDtypeStruct((Hp, W, 64), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM(((R + 4) * Wp, 64), mul)],
        )(x27s, k1.reshape(27, 64), b1.reshape(1, 64),
          k2.reshape(9, 64, 64), b2.reshape(1, 64))

    rows["fwd_kernel"] = timed(fwd_kernel, (x27s,))

    tap1, tap2 = jax.jit(fwd_kernel)(x27s)
    g1 = jnp.asarray(rng.standard_normal(tap1.shape), jnp.float32)
    g2 = jnp.asarray(rng.standard_normal(tap2.shape), jnp.float32)

    wpad = ((0, 0), (1, Wp - W - 1), (0, 0))

    def bwd_prep(tap1, tap2, g1, g2):
        dz2 = (g2 * (tap2 > 0)).astype(mul)
        dz2s = B._strips(jnp.pad(dz2, ((1, 1), (1, Wp - W - 1), (0, 0))), R)
        m1 = (tap1 > 0).astype(mul)
        g1m = (g1 * (tap1 > 0)).astype(mul)
        m1s = jnp.pad(m1, wpad).reshape(S, R * Wp, 64)
        g1ms = jnp.pad(g1m, wpad).reshape(S, R * Wp, 64)
        return dz2s, m1s, g1ms

    rows["bwd_prep_gather"] = timed(bwd_prep, (tap1, tap2, g1, g2))

    def bwd_prep_stack(tap1, tap2, g1, g2):
        dz2 = (g2 * (tap2 > 0)).astype(mul)
        dz2p = jnp.pad(dz2, ((1, 1), (1, Wp - W - 1), (0, 0)))
        dz2s = jnp.stack([
            jax.lax.dynamic_slice_in_dim(dz2p, i * R, R + 2, 0)
            for i in range(S)]).reshape(S, (R + 2) * Wp, 64)
        m1 = (tap1 > 0).astype(mul)
        g1m = (g1 * (tap1 > 0)).astype(mul)
        m1s = jnp.pad(m1, wpad).reshape(S, R * Wp, 64)
        g1ms = jnp.pad(g1m, wpad).reshape(S, R * Wp, 64)
        return dz2s, m1s, g1ms

    rows["bwd_prep_stack"] = timed(bwd_prep_stack, (tap1, tap2, g1, g2))

    dz2s, m1s, g1ms = jax.jit(bwd_prep)(tap1, tap2, g1, g2)

    def bwd_kernel(dz2s, m1s, g1ms):
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        nr = (R + 2) * Wp
        k2r = jnp.flip(k2, (0, 1)).reshape(9, 64, 64).transpose(0, 2, 1)
        k1t = k1.reshape(27, 64).T
        kernel = functools.partial(
            B._bwd_kernel, W=W, Wp=Wp, R=R, mul_dtype=mul)
        full = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
        cspec = lambda rows_, c: pl.BlockSpec(  # noqa: E731
            (1, rows_, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(S,),
            in_specs=[
                cspec(nr, 64), cspec(R * Wp, 64), cspec(R * Wp, 64),
                full((9, 64, 64)), full((64, 27)),
            ],
            out_specs=pl.BlockSpec((R, W, 27), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hp, W, 27), jnp.float32),
            scratch_shapes=[pltpu.VMEM(((R + 4) * Wp, 64), mul)],
        )(dz2s, m1s, g1ms, k2r, k1t)

    rows["bwd_kernel"] = timed(bwd_kernel, (dz2s, m1s, g1ms))

    dx27 = jax.jit(bwd_kernel)(dz2s, m1s, g1ms)
    rows["fold27"] = timed(lambda a: B._fold27(a[:H], H, W), (dx27,))

    for k, v in rows.items():
        print(json.dumps({"part": k, "ms": round(v, 3)}), flush=True)


if __name__ == "__main__":
    main()
