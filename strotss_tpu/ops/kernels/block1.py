"""Fused Pallas VGG block1: conv1(3→64) + ReLU + conv2(64→64) + ReLU.

**Status: verified correct, measured SLOWER than XLA — opt-in only.**

Why it was built (docs/MXU.md "Block1 formulation shoot-out"): at 512px
the two block1 convs are 65% of the VGG forward time for 13% of its
FLOPs — every XLA-level formulation (bf16 operands, 9 shifted matmuls,
space-to-depth, channel padding to 128) lands on a ~1.4 ms fwd / ~2.9 ms
fwd+bwd floor set by a fixed per-conv spatial-windowing overhead in the
XLA conv emitter at the large-H·W / C≤64 shape class. The hypothesis was
that a fused kernel — read the input once, keep the conv1 strip in VMEM,
write only the two f32 taps the STROTSS hypercolumn consumes
(``/root/reference/nn/model.py:7-15``) — would escape that overhead.

What was measured instead (tools/bench_block1{,_parts}.py on v5e, 512px):
fwd 1.92 ms vs 1.23 ms for XLA's conv pair; fwd+bwd 11.1 ms vs 2.7 ms.
Per-component attribution: the XLA-side im2col build is 1.43 ms (the
27-channel lane concat is a relayout pathology), the halo-strip gather
~0.95 ms, and the kernels themselves 1.8-1.9 ms — the 9 shifted-operand
VMEM slices (±1 sublane, relayout copies) plus the C=64→128 lane padding
cost more than the emitter overhead they were meant to remove. The floor
at this shape class is data movement, and Mosaic pays it too. Full table
in docs/MXU.md. Kept in-tree, tested, as an explicit
``config.block1_impl='pallas'`` opt-in for future compiler/hardware
re-evaluation.

Formulation
-----------
Row-strip grid. The image is pre-expanded (in XLA, cheap) into an im2col
tensor ``x27[h, w, (ky·3+kx)·3+c] = x[h+ky-1, w+kx-1, c]`` on a width-
padded grid (valid image columns live at ``[1, W+1)`` of ``Wp`` columns,
``Wp = roundup(W+2, 8)``), then gathered into overlapping row strips of
``R+2`` rows (1-row halo each side) so the standard Pallas pipeline can
double-buffer the HBM→VMEM streams. Per grid step the kernel computes:

    y1  = relu(x27_strip @ K1(27,64) + b1) · valid-mask     (R+2 rows)
    y2  = relu(Σ_t shifted-slice(y1) @ K2[t](64,64) + b2)   (R rows)

conv2 runs as 9 shifted matmuls over the *flattened* (rows·Wp, 64) strip
held in a VMEM scratch with one zero front row: a (dy, dx) tap of the
3×3 window is the row-slice starting at ``(dy+1)·Wp + dx - 1``. The
in-kernel iota mask zeroes the width-pad columns and out-of-image halo
rows, which is exactly SAME-padding for conv2 (and makes strip halos at
the image boundary correct).

Matmul shapes: conv1 is K=27 (MXU pads K to 128 — 0.9 GF, negligible),
conv2 is 9× (R·Wp, 64)×(64, 64) — M large, K=N=64, the ~25%-of-peak MXU
class, ~0.26 ms of compute at 512px vs the 1.4 ms XLA floor.

Backward (custom VJP, dgrad only)
---------------------------------
VGG weights are frozen everywhere in this framework (as in the reference,
whose Keras VGG is never trained — ``/root/reference/run_strotss.py:47``),
so the VJP returns **zeros for the weight/bias cotangents** and computes
only the image gradient:

    dz2  = dtap2 · (tap2 > 0)                       (XLA, fused elementwise)
    dy1  = (Σ_t shifted(dz2) @ K2r[t]) · m1 + dtap1·m1      (kernel)
    dx27 = dy1 @ K1ᵀ                                 (kernel)
    dx   = fold of the 9 shifted dx27 channel groups (XLA, 9 adds)

where ``K2r[t]`` is the spatially-flipped transposed kernel — the same
9-shifted-matmul structure as the forward. ReLU subgradient at exactly 0
is 0 here (mask ``tap > 0``) where ``jnp.maximum``'s VJP uses 0.5 — a
measure-zero difference on conv outputs, covered by tolerance tests.

Precision: operands are cast to ``mul_dtype`` (bfloat16 in the shipped
mixed policy — matching the DEFAULT-precision lax convs it replaces: bf16
MXU passes, f32 accumulation) with biases added and taps stored in f32.
``mul_dtype=float32`` exists for exactness tests (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from strotss_tpu.ops.kernels.common import round_up as _round_up


def _dot(a, b, mul_dtype):
    # mul_dtype=float32 is the exactness/test mode: force HIGHEST so
    # XLA:CPU (interpret mode) doesn't reroute the f32 matmul through its
    # bf16 oneDNN fast path. For bf16 operands precision is moot.
    prec = jax.lax.Precision.HIGHEST if mul_dtype == jnp.float32 else None
    return jnp.dot(
        a.astype(mul_dtype),
        b.astype(mul_dtype),
        precision=prec,
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(x27_ref, k1_ref, b1_ref, k2_ref, b2_ref,
                tap1_ref, tap2_ref, y1b_ref,
                *, H, W, Wp, R, mul_dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero_edges():
        # zero front row: every conv2 tap slice start (dy+1)*Wp + dx - 1
        # >= Wp - 1 >= 0; zero tail row: the (dy=2, dx=2) slice's last
        # element reads one row past the strip (feeding only discarded
        # pad-column outputs, but keep it defined)
        y1b_ref[0:Wp, :] = jnp.zeros((Wp, 64), mul_dtype)
        y1b_ref[pl.ds((R + 3) * Wp, Wp), :] = jnp.zeros((Wp, 64), mul_dtype)

    nr = (R + 2) * Wp
    # validity of each flattened strip position: kills width-pad columns
    # (SAME zero-padding for conv2) and out-of-image halo rows
    flat = jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0)
    grow = i * R + flat // Wp - 1
    col = flat % Wp
    valid = (grow >= 0) & (grow < H) & (col >= 1) & (col <= W)

    y1 = _dot(x27_ref[0], k1_ref[:], mul_dtype) + b1_ref[:]
    y1 = jnp.maximum(y1, 0.0) * valid.astype(jnp.float32)

    tap1_ref[:] = y1.reshape(R + 2, Wp, 64)[1:R + 1, 1:W + 1, :]
    y1b_ref[pl.ds(Wp, nr), :] = y1.astype(mul_dtype)

    acc = jnp.zeros((R * Wp, 64), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            op = y1b_ref[pl.ds((dy + 1) * Wp + dx - 1, R * Wp), :]
            acc = acc + _dot(op, k2_ref[3 * dy + dx], mul_dtype)
    y2 = jnp.maximum(acc + b2_ref[:], 0.0)
    tap2_ref[:] = y2.reshape(R, Wp, 64)[:, 1:W + 1, :]


def _bwd_kernel(dz2_ref, m1_ref, g1m_ref, k2r_ref, k1t_ref, dx27_ref,
                dz2b_ref, *, W, Wp, R, mul_dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero_edges():
        dz2b_ref[0:Wp, :] = jnp.zeros((Wp, 64), mul_dtype)
        dz2b_ref[pl.ds((R + 3) * Wp, Wp), :] = jnp.zeros((Wp, 64), mul_dtype)

    nr = (R + 2) * Wp
    dz2b_ref[pl.ds(Wp, nr), :] = dz2_ref[0]

    acc = jnp.zeros((R * Wp, 64), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            op = dz2b_ref[pl.ds((dy + 1) * Wp + dx - 1, R * Wp), :]
            acc = acc + _dot(op, k2r_ref[3 * dy + dx], mul_dtype)
    dy1 = acc * m1_ref[0].astype(jnp.float32) + g1m_ref[0].astype(jnp.float32)
    dx27 = _dot(dy1, k1t_ref[:], mul_dtype)
    dx27_ref[:] = dx27.reshape(R, Wp, 27)[:, 1:W + 1, :]


def _geom(H, W, R):
    Wp = _round_up(W + 2, 8)
    S = -(-H // R)
    return Wp, S, S * R


def _strips(x, R):
    """Gather (Hp+2, Wp, C) → (S, (R+2)·Wp, C) overlapping row strips."""
    Hp2, Wp, C = x.shape
    Hp = Hp2 - 2
    S = Hp // R
    idx = (jnp.arange(S) * R)[:, None] + jnp.arange(R + 2)[None, :]
    return x[idx].reshape(S, (R + 2) * Wp, C)


def _im2col(x, Hp, Wp):
    """x (H, W, 3) → x27 (Hp, Wp, 27); image columns at [1, W+1)."""
    H, W, _ = x.shape
    xbig = jnp.zeros((Hp + 2, Wp + 2, 3), x.dtype).at[1:H + 1, 2:W + 2].set(x)
    cols = [xbig[ky:ky + Hp, kx:kx + Wp, :]
            for ky in range(3) for kx in range(3)]
    return jnp.concatenate(cols, axis=-1)


def _fold27(dx27, H, W):
    """Transpose of _im2col: (H, W, 27) cotangent → (H, W, 3)."""
    dxp = jnp.zeros((H + 2, W + 2, 3), dx27.dtype)
    t = 0
    for ky in range(3):
        for kx in range(3):
            dxp = dxp.at[ky:ky + H, kx:kx + W, :].add(
                dx27[:, :, 3 * t:3 * t + 3])
            t += 1
    return dxp[1:H + 1, 1:W + 1, :]


def _fwd_call(x, k1, b1, k2, b2, R, mul_dtype, interpret):
    H, W, _ = x.shape
    Wp, S, Hp = _geom(H, W, R)
    x27 = _im2col(x.astype(jnp.float32), Hp, Wp).astype(mul_dtype)
    x27s = _strips(jnp.pad(x27, ((1, 1), (0, 0), (0, 0))), R)
    k1c = k1.astype(jnp.float32).reshape(27, 64)
    k2f = k2.astype(jnp.float32).reshape(9, 64, 64)
    b1r = b1.astype(jnp.float32).reshape(1, 64)
    b2r = b2.astype(jnp.float32).reshape(1, 64)

    nr = (R + 2) * Wp
    kernel = functools.partial(
        _fwd_kernel, H=H, W=W, Wp=Wp, R=R, mul_dtype=mul_dtype)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    tap1, tap2 = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, nr, 27), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((27, 64)), full((1, 64)), full((9, 64, 64)), full((1, 64)),
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
        scratch_shapes=[pltpu.VMEM(((R + 4) * Wp, 64), mul_dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=min(2 * Hp * Wp * (27 * 64 + 9 * 64 * 64), 2 ** 31 - 1),
            bytes_accessed=min(Hp * Wp * (27 * 2 + 8 * 64 * 4), 2 ** 31 - 1),
            transcendentals=0,
        ),
    )(x27s, k1c, b1r, k2f, b2r)
    return tap1[:H], tap2[:H]


def _bwd_call(tap1, tap2, g1, g2, k1, k2, R, mul_dtype, interpret):
    H, W, _ = tap1.shape
    Wp, S, Hp = _geom(H, W, R)
    wpad = ((0, Hp - H), (1, Wp - W - 1), (0, 0))
    dz2 = (g2 * (tap2 > 0)).astype(mul_dtype)
    dz2s = _strips(jnp.pad(dz2, ((1, Hp + 1 - H), (1, Wp - W - 1), (0, 0))), R)
    m1 = (tap1 > 0).astype(mul_dtype)
    g1m = (g1.astype(jnp.float32) * m1.astype(jnp.float32)).astype(mul_dtype)
    m1s = jnp.pad(m1, wpad).reshape(S, R * Wp, 64)
    g1ms = jnp.pad(g1m, wpad).reshape(S, R * Wp, 64)
    k2r = jnp.flip(k2.astype(jnp.float32), (0, 1)).reshape(
        9, 64, 64).transpose(0, 2, 1)
    k1t = k1.astype(jnp.float32).reshape(27, 64).T

    nr = (R + 2) * Wp
    kernel = functools.partial(
        _bwd_kernel, W=W, Wp=Wp, R=R, mul_dtype=mul_dtype)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    cspec = lambda rows, c: pl.BlockSpec(  # noqa: E731
        (1, rows, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dx27 = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            cspec(nr, 64), cspec(R * Wp, 64), cspec(R * Wp, 64),
            full((9, 64, 64)), full((64, 27)),
        ],
        out_specs=pl.BlockSpec((R, W, 27), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, W, 27), jnp.float32),
        scratch_shapes=[pltpu.VMEM(((R + 4) * Wp, 64), mul_dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=min(2 * Hp * Wp * (9 * 64 * 64 + 64 * 27), 2 ** 31 - 1),
            bytes_accessed=min(Hp * Wp * 64 * 8, 2 ** 31 - 1),
            transcendentals=0,
        ),
    )(dz2s, m1s, g1ms, k2r, k1t)
    return _fold27(dx27[:H], H, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def block1_pallas(x, k1, b1, k2, b2, rows_per_strip: int = 4,
                  mul_dtype=jnp.bfloat16, interpret: bool = False):
    """Fused VGG block1 forward: (tap1, tap2), both (H, W, 64) float32.

    ``x`` is the *preprocessed* (H, W, 3) image. Gradients flow to ``x``
    only — the weight/bias cotangents are zeros (frozen-VGG contract; the
    framework never differentiates w.r.t. VGG parameters, matching the
    reference whose extractor is a frozen Keras model).
    """
    return _fwd_call(x, k1, b1, k2, b2, rows_per_strip, mul_dtype, interpret)


def _vjp_fwd(x, k1, b1, k2, b2, rows_per_strip, mul_dtype, interpret):
    tap1, tap2 = _fwd_call(
        x, k1, b1, k2, b2, rows_per_strip, mul_dtype, interpret)
    return (tap1, tap2), (tap1, tap2, k1, b1, k2, b2)


def _vjp_bwd(rows_per_strip, mul_dtype, interpret, res, g):
    tap1, tap2, k1, b1, k2, b2 = res
    g1, g2 = g
    dx = _bwd_call(tap1, tap2, g1, g2, k1, k2,
                   rows_per_strip, mul_dtype, interpret)
    return (dx, jnp.zeros_like(k1), jnp.zeros_like(b1),
            jnp.zeros_like(k2), jnp.zeros_like(b2))


block1_pallas.defvjp(_vjp_fwd, _vjp_bwd)
