"""Fused Pallas self-similarity loss: tiled, no N x N HBM materialization.

The STROTSS content loss (``/root/reference/nn/losses.py:55-66``) compares
column-sum-normalized self-cosine matrices:

    D_x = 1 - x̂ x̂ᵀ          (N x N)
    A   = D_x / max(colsum(D_x), eps)   (column-wise)
    loss = mean|A - B| * N = Σ|A - B| / N

Two structural facts make a streaming kernel cheap:

1. ``colsum(D_x)_j = N - (Σ_i x̂_i)·x̂_j`` — closed form, O(NC), no pass
   over the matrix needed.
2. The gradient through the column normalization is analytic:
   with S = sign(A - B) and t_j = Σ_i S_ij D_ij,

       ∂loss/∂D_x[i,j] = (S_ij / c_j - t_j / c_j²) / N =: G_x[i,j]
       ∂loss/∂x̂      = -(G_x + G_xᵀ) x̂                (D = 1 - x̂x̂ᵀ)

   so the backward needs only the same streamed tiles plus the N-vectors
   t_x, t_y (accumulated during the forward).

Forward: one (I, J) sweep accumulating Σ|A-B|, t_x, t_y in VMEM-resident
accumulators. Backward: two sweeps computing (G @ x̂) and (Gᵀ @ x̂) — the
same kernel with the c/t broadcast axis switched. HBM traffic is O(N·C)
per pass; XLA's implementation materializes multiple N² buffers.

Used automatically for large N via ``self_similarity(..., impl='auto')``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strotss_tpu.ops.kernels.common import (
    _COLSUM_EPS,
    _L2NORM_EPS,
    normalize_rows as _normalize,
    round_up as _round_up,
)


def _dot_nt(a, b):
    """a (P, C) @ b (Q, C)ᵀ -> (P, Q) in f32/highest."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(xh_o, yh_o, xh_r, yh_r, cx, cy, total_ref, tx_ref, ty_ref,
                *, n: int, tn: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        total_ref[:] = jnp.zeros_like(total_ref)
        tx_ref[:] = jnp.zeros_like(tx_ref)
        ty_ref[:] = jnp.zeros_like(ty_ref)

    dx = 1.0 - _dot_nt(xh_o[:], xh_r[:])  # (tn, tn)
    dy = 1.0 - _dot_nt(yh_o[:], yh_r[:])
    cx_r = cx[0, pl.ds(j * tn, tn)][None, :]
    cy_r = cy[0, pl.ds(j * tn, tn)][None, :]
    a = dx / cx_r
    b = dy / cy_r
    rows = i * tn + jax.lax.broadcasted_iota(jnp.int32, (tn, tn), 0)
    cols = j * tn + jax.lax.broadcasted_iota(jnp.int32, (tn, tn), 1)
    ok = (rows < n) & (cols < n)
    diff = jnp.where(ok, a - b, 0.0)
    s = jnp.sign(diff)
    # scalar stores to VMEM are unsupported (and 1-D reshapes don't lower):
    # accumulate a (1, tn) partial row, reduced to a scalar outside
    total_ref[:] += jnp.sum(jnp.abs(diff), axis=0, keepdims=True)
    tx_ref[0, pl.ds(j * tn, tn)] += jnp.sum(
        jnp.where(ok, s * dx, 0.0), axis=0)
    ty_ref[0, pl.ds(j * tn, tn)] += jnp.sum(
        jnp.where(ok, s * dy, 0.0), axis=0)


def _bwd_kernel(xh_o, yh_o, xh_r, yh_r, cx, cy, tx, ty, ux_ref, uy_ref,
                *, n: int, tn: int, col_mode: bool):
    o = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _init():
        ux_ref[:] = jnp.zeros_like(ux_ref)
        uy_ref[:] = jnp.zeros_like(uy_ref)

    dx = 1.0 - _dot_nt(xh_o[:], xh_r[:])  # (tn_o, tn_r)
    dy = 1.0 - _dot_nt(yh_o[:], yh_r[:])
    rows = o * tn + jax.lax.broadcasted_iota(jnp.int32, (tn, tn), 0)
    cols = r * tn + jax.lax.broadcasted_iota(jnp.int32, (tn, tn), 1)
    ok = (rows < n) & (cols < n)

    if col_mode:
        # accumulating (Gᵀ x̂): entry [o, r] is G[r, o] — c/t indexed by the
        # OUT block (broadcast down columns)
        cx_b = cx[0, pl.ds(o * tn, tn)][:, None]
        cy_b = cy[0, pl.ds(o * tn, tn)][:, None]
        tx_b = tx[0, pl.ds(o * tn, tn)][:, None]
        ty_b = ty[0, pl.ds(o * tn, tn)][:, None]
    else:
        # accumulating (G x̂): c/t indexed by the reduced block
        cx_b = cx[0, pl.ds(r * tn, tn)][None, :]
        cy_b = cy[0, pl.ds(r * tn, tn)][None, :]
        tx_b = tx[0, pl.ds(r * tn, tn)][None, :]
        ty_b = ty[0, pl.ds(r * tn, tn)][None, :]

    s = jnp.sign(dx / cx_b - dy / cy_b)
    s = jnp.where(ok, s, 0.0)
    inv_n = 1.0 / n
    gx = (s / cx_b - jnp.where(ok, tx_b / (cx_b * cx_b), 0.0)) * inv_n
    gy = (-s / cy_b + jnp.where(ok, ty_b / (cy_b * cy_b), 0.0)) * inv_n
    gx = jnp.where(ok, gx, 0.0)
    gy = jnp.where(ok, gy, 0.0)

    ux_ref[:] += jax.lax.dot_general(
        gx, xh_r[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    uy_ref[:] += jax.lax.dot_general(
        gy, yh_r[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _prep(x, y):
    n, c = x.shape
    tn = 128 if _round_up(c, 128) > 1024 else 256
    np_ = _round_up(n, tn)
    cp = _round_up(c, 128)
    xh, xinv = _normalize(x)
    yh, yinv = _normalize(y)
    xp = jnp.zeros((np_, cp), jnp.float32).at[:n, :c].set(xh)
    yp = jnp.zeros((np_, cp), jnp.float32).at[:n, :c].set(yh)
    # closed-form column sums: c_j = N - (Σ x̂_i)·x̂_j
    cx = jnp.maximum(
        n - jnp.matmul(xh, jnp.sum(xh, axis=0), precision="highest"),
        _COLSUM_EPS,
    )
    cy = jnp.maximum(
        n - jnp.matmul(yh, jnp.sum(yh, axis=0), precision="highest"),
        _COLSUM_EPS,
    )
    cxp = jnp.ones((1, np_), jnp.float32).at[0, :n].set(cx)
    cyp = jnp.ones((1, np_), jnp.float32).at[0, :n].set(cy)
    return xh, yh, xinv, yinv, xp, yp, cxp, cyp, n, np_, cp, tn


def _fwd_call(xp, yp, cxp, cyp, n, np_, cp, tn, interpret):
    grid = (np_ // tn, np_ // tn)
    kernel = functools.partial(_fwd_kernel, n=n, tn=tn)
    vspec = lambda im: pl.BlockSpec((tn, cp), im, memory_space=pltpu.VMEM)  # noqa: E731
    total, tx, ty = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vspec(lambda i, j: (i, 0)),
            vspec(lambda i, j: (i, 0)),
            vspec(lambda i, j: (j, 0)),
            vspec(lambda i, j: (j, 0)),
            pl.BlockSpec((1, np_), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tn), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, tn), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # capped: huge values overflow the compile-service protos
            flops=min(4 * np_ * np_ * cp, 2 ** 31 - 1),
            bytes_accessed=min(8 * np_ * cp, 2 ** 31 - 1),
            transcendentals=0,
        ),
    )(xp, yp, xp, yp, cxp, cyp)
    return jnp.sum(total) / n, tx, ty


def _bwd_call(xp, yp, cxp, cyp, tx, ty, n, np_, cp, tn, col_mode, interpret):
    grid = (np_ // tn, np_ // tn)
    kernel = functools.partial(_bwd_kernel, n=n, tn=tn, col_mode=col_mode)
    vspec = lambda im: pl.BlockSpec((tn, cp), im, memory_space=pltpu.VMEM)  # noqa: E731
    rowvec = pl.BlockSpec((1, np_), lambda o, r: (0, 0), memory_space=pltpu.VMEM)
    ux, uy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vspec(lambda o, r: (o, 0)),
            vspec(lambda o, r: (o, 0)),
            vspec(lambda o, r: (r, 0)),
            vspec(lambda o, r: (r, 0)),
            rowvec, rowvec, rowvec, rowvec,
        ],
        out_specs=(
            pl.BlockSpec((tn, cp), lambda o, r: (o, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, cp), lambda o, r: (o, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_, cp), jnp.float32),
            jax.ShapeDtypeStruct((np_, cp), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=min(8 * np_ * np_ * cp, 2 ** 31 - 1),
            bytes_accessed=min(12 * np_ * cp, 2 ** 31 - 1),
            transcendentals=0,
        ),
    )(xp, yp, xp, yp, cxp, cyp, tx, ty)
    return ux, uy


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def self_similarity_pallas(x, y, interpret: bool = False):
    """Fused self-similarity loss; exact analytic gradients.

    Matches ``losses.self_similarity`` (same eps floors and reductions) —
    validated in tests/test_kernels.py. Requires ``x.shape == y.shape``.
    """
    loss, _, _ = _fwd_impl(x, y, interpret)
    return loss


def _fwd_impl(x, y, interpret):
    assert x.shape == y.shape, "self-similarity compares equal sample counts"
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xh, yh, xinv, yinv, xp, yp, cxp, cyp, n, np_, cp, tn = _prep(x, y)
    loss, tx, ty = _fwd_call(xp, yp, cxp, cyp, n, np_, cp, tn, interpret)
    return loss, (xh, yh, xinv, yinv, xp, yp, cxp, cyp, tx, ty, n, np_, cp, tn), None


def _fwd_vjp(x, y, interpret):
    loss, res, _ = _fwd_impl(x, y, interpret)
    return loss, res


def _bwd_vjp(interpret, res, g):
    xh, yh, xinv, yinv, xp, yp, cxp, cyp, tx, ty, n, np_, cp, tn = res
    u = _bwd_call(xp, yp, cxp, cyp, tx, ty, n, np_, cp, tn, False, interpret)
    v = _bwd_call(xp, yp, cxp, cyp, tx, ty, n, np_, cp, tn, True, interpret)
    c = xh.shape[1]
    dxh = -(u[0] + v[0])[:n, :c]
    dyh = -(u[1] + v[1])[:n, :c]
    # pull back through row normalization: dx = (dx̂ - (dx̂·x̂)x̂)·inv
    dx = (dxh - jnp.sum(dxh * xh, axis=1, keepdims=True) * xh) * xinv
    dy = (dyh - jnp.sum(dyh * yh, axis=1, keepdims=True) * yh) * yinv
    return g * dx, g * dy


self_similarity_pallas.defvjp(_fwd_vjp, _bwd_vjp)
