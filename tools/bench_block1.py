"""Why is VGG block1 at 3.5% MXU, and what fixes it?

tools/profile_vgg.py showed block1 (conv 3->64 + conv 64->64 at full
resolution) takes 1.95 ms of the 2.99 ms VGG forward at 512px — 6.9 TF/s
— while blocks 3-4 run at 63-73% MXU. This times isolated block1
formulation variants on the real chip.

Methodology: per-call timings through the axon tunnel carry ~1-3 ms of
per-execution overhead (an isolated 0.46 GF conv "measured" slower than
the whole block), so every variant here runs amortized inside a 30-step
``lax.scan`` whose per-step input is perturbed (prevents hoisting) — the
same methodology as tools/trace_step.py. Each variant returns BOTH taps
(conv1 and conv2 outputs in f32), matching what the real hypercolumn
consumes.

Variants:
  policy      the shipped mixed policy (f32 operands, DEFAULT precision)
  bf16        pure bf16 operands, f32 outputs
  f32_highest f32 operands, HIGHEST (6-pass) — r2's rejected variant
  shift9_2    lax conv1, conv2 as 9 shifted (HW,64)x(64,64) matmuls
  s2d         both convs in 2x2 space-to-depth domain: conv1' is
              3x3x12x256, conv2' is 3x3x256x256 at half resolution —
              the shape class that measured 63% MXU (block3) — then
              depth-to-space back to full-res taps. 4x the dense FLOPs.
  pad128      channels zero-padded to 128 (full MXU lanes; 4x FLOPs) —
              control for the half-lane hypothesis.

    python tools/bench_block1.py [--scale 512]
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

BLOCK1_GF = None  # set in main from the actual (h, w)


def _sync(out):
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timed_scan(fn, img, steps=30, reps=3):
    """Amortized ms/step: run `steps` perturbed applications inside one
    scan program; report the best of `reps` program executions."""
    ts = jnp.arange(1, steps + 1, dtype=jnp.float32)

    @jax.jit
    def run(img, ts):
        def body(c, t):
            t1, t2 = fn(img * (1.0 + 1e-3 * t))
            return c + jnp.mean(t1.astype(jnp.float32)) + jnp.mean(
                t2.astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), ts)
        return c

    out = run(img, ts)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(img, ts)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / steps * 1000.0)
    return best


def timed_scan_grad(fn, img, steps=15, reps=3):
    """Amortized fwd+bwd ms/step (grad w.r.t. the image, like the
    pyramid backward)."""
    ts = jnp.arange(1, steps + 1, dtype=jnp.float32)

    def loss(im):
        t1, t2 = fn(im)
        return jnp.mean(t1.astype(jnp.float32)) + jnp.mean(
            t2.astype(jnp.float32))

    @jax.jit
    def run(img, ts):
        def body(c, t):
            g = jax.grad(loss)(img * (1.0 + 1e-3 * t))
            return c + jnp.mean(g), None
        c, _ = jax.lax.scan(body, jnp.float32(0), ts)
        return c

    out = run(img, ts)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(img, ts)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / steps * 1000.0)
    return best


def conv_lax(x, k, b, precision, out_dtype=jnp.float32):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    return jnp.maximum(y.astype(out_dtype) + b.astype(out_dtype), 0.0)


def conv_shift9(x, k, b, out_dtype=jnp.float32):
    """3x3 SAME conv as 9 shifted (HW, Cin) x (Cin, Cout) matmuls —
    no patch materialization; K=Cin per matmul."""
    n, hh, ww, cin = x.shape
    cout = k.shape[-1]
    xb = x.astype(jnp.bfloat16)
    xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros((n, hh, ww, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(
                xp, (0, dy, dx, 0), (n, hh, ww, cin)
            ).reshape(n * hh * ww, cin)
            y = y + jax.lax.dot_general(
                xs, k[dy, dx].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(n, hh, ww, cout)
    return jnp.maximum(y.astype(out_dtype) + b.astype(out_dtype), 0.0)


def s2d(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def d2s(x):
    n, h2, w2, c4 = x.shape
    c = c4 // 4
    return x.reshape(n, h2, w2, 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, h2 * 2, w2 * 2, c)


def s2d_kernel(k):
    """Transform a 3x3 stride-1 SAME kernel (3,3,cin,cout) into the
    equivalent 3x3 kernel over the 2x2 space-to-depth domain
    (3,3,4*cin,4*cout). Channel order matches s2d(): ((py*2+px)*c + ch).
    dy = 2*sy + py - qy + 1 must land in [0,3) for a nonzero entry."""
    kh, kw, cin, cout = k.shape
    assert (kh, kw) == (3, 3)
    k = np.asarray(k, np.float32)
    K = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    for syi, sy in enumerate((-1, 0, 1)):
        for sxi, sx in enumerate((-1, 0, 1)):
            for py in range(2):
                for px in range(2):
                    for qy in range(2):
                        for qx in range(2):
                            dy = 2 * sy + py - qy + 1
                            dx = 2 * sx + px - qx + 1
                            if 0 <= dy < 3 and 0 <= dx < 3:
                                pi = (py * 2 + px) * cin
                                qi = (qy * 2 + qx) * cout
                                K[syi, sxi, pi:pi + cin, qi:qi + cout] = \
                                    k[dy, dx]
    return jnp.asarray(K)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--variants", type=str, default=None,
                    help="comma list to run (default: all)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu.models.weights import load_vgg_params
    from strotss_tpu.solve import resize_max_hw

    params = load_vgg_params()
    k1, b1 = params["block1_conv1"]["kernel"], params["block1_conv1"]["bias"]
    k2, b2 = params["block1_conv2"]["kernel"], params["block1_conv2"]["bias"]
    k1 = jnp.asarray(k1, jnp.float32)
    k2 = jnp.asarray(k2, jnp.float32)
    b1 = jnp.asarray(b1, jnp.float32)
    b2 = jnp.asarray(b2, jnp.float32)
    rng = np.random.default_rng(0)
    h, w = resize_max_hw(321, 481, args.scale)
    img = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
    gf = (2.0 * h * w * 9 * (3 * 64 + 64 * 64)) / 1e9

    P = jax.lax.Precision

    # s2d setup: pad H to even, transform kernels once on host
    hp = h + (h % 2)
    k1s = s2d_kernel(k1)          # (3,3,12,256)
    k2s = s2d_kernel(k2)          # (3,3,256,256)
    b1s = jnp.tile(b1, 4)
    b2s = jnp.tile(b2, 4)

    def block_s2d(x, dtype=jnp.bfloat16):
        n = x.shape[0]
        xpad = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
        xs = s2d(xpad.astype(dtype))                  # (1, hp/2, w/2, 12)
        y1 = jax.lax.conv_general_dilated(
            xs, k1s.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        y1 = jnp.maximum(y1 + b1s, 0.0)               # (1, hp/2, w/2, 256)
        y2 = jax.lax.conv_general_dilated(
            y1.astype(dtype), k2s.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        y2 = jnp.maximum(y2 + b2s, 0.0)
        t1 = d2s(y1)[:, :h]                           # full-res f32 taps
        t2 = d2s(y2)[:, :h]
        return t1, t2

    # pad128 control: zero-pad kernels/bias so every conv is 128ch
    k1p = jnp.zeros((3, 3, 3, 128), jnp.float32).at[:, :, :, :64].set(k1)
    b1p = jnp.zeros((128,), jnp.float32).at[:64].set(b1)
    k2p = jnp.zeros((3, 3, 128, 128), jnp.float32).at[:, :, :64, :64].set(k2)
    b2p = jnp.zeros((128,), jnp.float32).at[:64].set(b2)

    def block_pad128(x):
        y1 = conv_lax(x, k1p, b1p, P.DEFAULT)
        y2 = conv_lax(y1, k2p, b2p, P.DEFAULT)
        return y1[..., :64], y2[..., :64]

    from strotss_tpu.ops.kernels.block1 import block1_pallas

    def block_pallas(x, rows):
        t1, t2 = block1_pallas(x[0], k1, b1, k2, b2, rows, jnp.bfloat16)
        return t1[None], t2[None]

    variants = {
        # r8+ exceeds the 16 MB scoped-VMEM limit at 512px (measured:
        # 22.5 MB); r4 is the widest strip that fits
        "pallas_r2": lambda x: block_pallas(x, 2),
        "pallas_r4": lambda x: block_pallas(x, 4),
        "policy_f32_default": lambda x: (
            lambda y1: (y1, conv_lax(y1, k2, b2, P.DEFAULT)))(
                conv_lax(x, k1, b1, P.DEFAULT)),
        "bf16": lambda x: (
            lambda y1: (y1.astype(jnp.float32),
                        conv_lax(y1, k2, b2, P.DEFAULT)))(
                conv_lax(x.astype(jnp.bfloat16), k1, b1, P.DEFAULT,
                         out_dtype=jnp.bfloat16)),
        "f32_highest": lambda x: (
            lambda y1: (y1, conv_lax(y1, k2, b2, P.HIGHEST)))(
                conv_lax(x, k1, b1, P.HIGHEST)),
        "shift9_2": lambda x: (
            lambda y1: (y1, conv_shift9(y1, k2, b2)))(
                conv_lax(x, k1, b1, P.DEFAULT)),
        "s2d": block_s2d,
        "pad128": block_pad128,
    }
    if args.variants:
        keep = set(args.variants.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    # correctness vs exact f32 (bf16 MXU passes => ~4e-3 rel tolerated)
    want1, want2 = jax.jit(lambda x: (
        lambda y1: (y1, conv_lax(y1, k2, b2, P.HIGHEST)))(
            conv_lax(x, k1, b1, P.HIGHEST)))(img)
    want2 = np.asarray(want2)
    for name, fn in variants.items():
        try:
            got2 = np.asarray(jax.jit(fn)(img)[1], np.float32)
            err = float(np.max(np.abs(want2 - got2)) /
                        max(1e-9, np.max(np.abs(want2))))
            row = {"variant": name, "conv2_max_rel_err": round(err, 6)}
        except Exception as e:
            row = {"variant": name,
                   "error": f"{type(e).__name__}: "
                            f"{str(e).splitlines()[0][:160]}"}
        print(json.dumps(row), flush=True)

    print(f"# block1 at ({h}, {w}); {gf:.1f} GF analytic; "
          f"scan-amortized over {args.steps} steps", flush=True)
    for name, fn in variants.items():
        try:
            ms = timed_scan(fn, img, steps=args.steps)
            row = {"variant": name, "fwd_ms": round(ms, 3),
                   "tflops": round(gf / ms, 1)}
        except Exception as e:
            row = {"variant": name,
                   "error": f"{type(e).__name__}: "
                            f"{str(e).splitlines()[0][:160]}"}
        print(json.dumps(row), flush=True)

    for name, fn in variants.items():
        try:
            ms = timed_scan_grad(fn, img, steps=max(5, args.steps // 2))
            row = {"variant": name + "+bwd", "fwd_bwd_ms": round(ms, 3)}
        except Exception as e:
            row = {"variant": name + "+bwd",
                   "error": f"{type(e).__name__}: "
                            f"{str(e).splitlines()[0][:160]}"}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
