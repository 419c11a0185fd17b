"""Streamed (tiled) Sinkhorn: flash-style online-LSE updates, no N x M buffer.

The XLA Sinkhorn (``strotss_tpu.ops.losses.sinkhorn``) materializes
``log_k = -lam * dist(x, y)`` once (N*M floats) and iterates logsumexp
updates over it. That is the right call while N*M fits comfortably in HBM —
the cost matrix is iteration-invariant, so materializing it amortizes the
O(N*M*C) distance build across all iterations. Past ~16k² samples the
buffer (plus its backward copies) dominates the chip's HBM, which is the
capability gap the reference left open (its ``sinkhorn_knopp`` is dead and
buggy, ``/root/reference/nn/losses.py:83-105``; SURVEY.md §7.9 plans the
tiled kernel).

This module computes every update pass **tile by tile from the raw feature
matrices**: a Pallas kernel streams (TN, TM) distance tiles through VMEM
(two MXU matmuls per tile for 'both'), maintaining the flash-attention-style
running (max, sumexp) pair per row — no N x M tensor ever exists, in HBM or
VMEM. HBM traffic per pass is O((N+M)*C).

Iteration order is exactly the XLA implementation's Gauss-Seidel order
(u-update from v, then v-update from the new u), so in interpret mode the
final loss matches the XLA path to float-associativity tolerance.

Gradients: the custom VJP is the **plan-weighted (Danskin) gradient**
``dL/dd_ij = T_ij`` with ``T`` the converged transport plan — the exact
gradient of the dual entropic-OT objective at its optimum (see
``_sinkhorn_bwd`` for why the naive frozen-potentials variant is wrong).
It costs ONE extra streamed pass instead of re-running all iterations
backward. The backward pass streams row blocks with ``lax.map`` (peak
memory O(block * M), block ~512) — it runs once per step versus the
forward's 2*n_iter passes, so a jnp formulation is the right tool there.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strotss_tpu.ops.kernels.common import round_up as _round_up
from strotss_tpu.ops.kernels.remd import _dist_tile, _DIST_CODE

_NEG_BIG = -3.4e38


def _lse_kernel(
    n_ref,  # SMEM (1,1): actual N (rows)
    m_ref,  # SMEM (1,1): actual M (cols)
    x_ref,  # VMEM (TN, Cp)
    y_ref,  # VMEM (TM, Cp)
    logv_ref,  # VMEM (1, TM): per-column additive potentials
    runmax_ref,  # VMEM (1, Np) running max accumulator
    runsum_ref,  # VMEM (1, Np) running scaled sumexp
    *,
    dist_code: int,
    channels: int,
    lam: float,
    tn: int,
    tm: int,
):
    """One (i, j) tile of ``LSE_j(-lam * d_ij + logv_j)`` with online LSE.

    TPU grid iteration is sequential (j fastest), so the constant-index
    output rows act as accumulators across the column sweep of each row
    tile.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    n = n_ref[0, 0]
    m = m_ref[0, 0]

    @pl.when(j == 0)
    def _init():
        runmax_ref[0, pl.ds(i * tn, tn)] = jnp.full((tn,), _NEG_BIG, jnp.float32)
        runsum_ref[0, pl.ds(i * tn, tn)] = jnp.zeros((tn,), jnp.float32)

    d = _dist_tile(x_ref[:], y_ref[:], dist_code, channels)
    z = -lam * d + logv_ref[0, :][None, :]

    cols = j * tm + jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1)
    z = jnp.where(cols < m, z, _NEG_BIG)

    tile_max = jnp.max(z, axis=1)
    run_max = runmax_ref[0, pl.ds(i * tn, tn)]
    new_max = jnp.maximum(run_max, tile_max)
    # exp(_NEG_BIG - new_max) underflows to 0 for fully-masked starts
    scale = jnp.exp(run_max - new_max)
    tile_sum = jnp.sum(jnp.exp(z - new_max[:, None]), axis=1)
    runsum_ref[0, pl.ds(i * tn, tn)] = (
        runsum_ref[0, pl.ds(i * tn, tn)] * scale + tile_sum
    )
    runmax_ref[0, pl.ds(i * tn, tn)] = new_max


def _pick_tiles(n: int, m: int, c: int) -> Tuple[int, int, int]:
    cp = _round_up(c, 128)
    max_tile = 256 if cp <= 1024 else 128
    tn = min(max_tile, _round_up(n, 128))
    tm = min(max_tile, _round_up(m, 128))
    return tn, tm, cp


def lse_pass(
    x: jnp.ndarray,
    y: jnp.ndarray,
    logv: jnp.ndarray,
    lam: float,
    distance: str,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N,) ``LSE_j(-lam * dist(x, y)_ij + logv_j)`` without forming N x M.

    The transposed update (LSE over rows) is the same call with arguments
    swapped — every supported distance is symmetric in (x, y).
    """
    n, c = x.shape
    m = y.shape[0]
    tn, tm, cp = _pick_tiles(n, m, c)
    np_, mp = _round_up(n, tn), _round_up(m, tm)

    xp = jnp.zeros((np_, cp), jnp.float32).at[:n, :c].set(x)
    yp = jnp.zeros((mp, cp), jnp.float32).at[:m, :c].set(y)
    # padded columns carry -inf-like potentials via the col mask in-kernel;
    # keep the buffer finite so 0*inf never appears
    vp = jnp.full((1, mp), 0.0, jnp.float32).at[0, :m].set(logv)

    kernel = functools.partial(
        _lse_kernel,
        dist_code=_DIST_CODE[distance],
        channels=c,
        lam=float(lam),
        tn=tn,
        tm=tm,
    )
    runmax, runsum = pl.pallas_call(
        kernel,
        grid=(np_ // tn, mp // tm),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tn, cp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, cp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, np_), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=min(2 * np_ * mp * cp * (2 if distance == "both" else 1),
                      2 ** 31 - 1),
            bytes_accessed=min(4 * (np_ * cp + mp * cp + 3 * np_ + mp),
                               2 ** 31 - 1),
            transcendentals=min(np_ * mp, 2 ** 31 - 1),
        ),
    )(jnp.array([[n]], jnp.int32), jnp.array([[m]], jnp.int32), xp, yp, vp)
    return jnp.log(jnp.maximum(runsum[0, :n], 1e-38)) + runmax[0, :n]


def _transport_readout(x, y, log_u, log_v, lam, distance, block=512,
                       freeze_plan=False):
    """``sum_ij exp(log_u_i - lam*d_ij + log_v_j) * d_ij`` in row blocks.

    ``freeze_plan=True`` stop-gradients the transport plan T, leaving only
    the explicit ``sum T * d`` dependence differentiable — the VJP then
    yields the plan-weighted gradient ``dx = sum_j T_ij dd_ij/dx`` (see
    ``_sinkhorn_bwd``).
    """
    from strotss_tpu.ops.losses import dist_metrics

    m_dist = dist_metrics[distance]

    def one(args):
        xb, lub = args
        d = m_dist(xb, y)  # (block, M)
        t = jnp.exp(lub[:, None] - lam * d + log_v[None, :])
        if freeze_plan:
            t = jax.lax.stop_gradient(t)
        return jnp.sum(t * d)

    n = x.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    # padded rows: log_u = -inf-ish so their plan mass is exactly 0
    lup = jnp.pad(log_u, (0, pad), constant_values=_NEG_BIG)
    idx = jnp.arange(nb) * block
    parts = jax.lax.map(
        lambda i: one((jax.lax.dynamic_slice_in_dim(xp, i, block),
                       jax.lax.dynamic_slice_in_dim(lup, i, block))),
        idx,
    )
    return jnp.sum(parts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def sinkhorn_streamed(
    x: jnp.ndarray,
    y: jnp.ndarray,
    distance: str = "cosine",
    lam: float = 10.0,
    n_iter: int = 30,
    interpret: bool = False,
) -> jnp.ndarray:
    """Entropic OT cost with streamed tiles; drop-in for ``losses.sinkhorn``
    at sample counts where the N x M kernel matrix must never exist."""
    loss, _, _ = _sinkhorn_forward(x, y, distance, lam, n_iter, interpret)
    return loss


def _sinkhorn_forward(x, y, distance, lam, n_iter, interpret):
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    n, m = x.shape[0], y.shape[0]
    log_p = jnp.full((n,), -jnp.log(float(n)), jnp.float32)
    log_q = jnp.full((m,), -jnp.log(float(m)), jnp.float32)

    def body(carry, _):
        log_u, log_v = carry
        # same Gauss-Seidel order as losses.sinkhorn
        log_u = log_p - lse_pass(x, y, log_v, lam, distance, interpret)
        log_v = log_q - lse_pass(y, x, log_u, lam, distance, interpret)
        return (log_u, log_v), None

    (log_u, log_v), _ = jax.lax.scan(
        body, (jnp.zeros((n,), jnp.float32), jnp.zeros((m,), jnp.float32)),
        None, length=n_iter,
    )
    loss = _transport_readout(x, y, log_u, log_v, lam, distance)
    return loss, log_u, log_v


def _sinkhorn_fwd(x, y, distance, lam, n_iter, interpret):
    loss, log_u, log_v = _sinkhorn_forward(x, y, distance, lam, n_iter,
                                           interpret)
    return loss, (x, y, log_u, log_v)


def _sinkhorn_bwd(distance, lam, n_iter, interpret, res, g):
    """Plan-weighted (Danskin) VJP: ``dx = g * sum_j T_ij * dd_ij/dx``.

    This is the gradient of the *dual* entropic-OT objective at the
    converged potentials (Danskin: the potentials are argmax of the dual,
    so only the explicit -M dependence differentiates, giving exactly T) —
    identical to ``jax.grad`` of the XLA path with ``stop_gradient`` on the
    whole plan (asserted in tests), and empirically cosine>0.9 to the fully
    unrolled gradient at convergence. The naive alternative (freezing only
    the potentials, keeping ``exp(-lam*d)`` differentiable) is *wrong* as a
    descent direction: its explicit ``-lam*T*d`` term dominates and flips
    the sign (measured cos ~ -0.86 against unrolled).

    One block-streamed pass; it runs once per step versus the forward's
    2*n_iter passes.
    """
    x, y, log_u, log_v = res

    def readout(x_, y_):
        return _transport_readout(
            x_, y_, log_u, log_v, lam, distance, freeze_plan=True,
        )

    dx, dy = jax.grad(readout, argnums=(0, 1))(x.astype(jnp.float32),
                                               y.astype(jnp.float32))
    return g * dx, g * dy


sinkhorn_streamed.defvjp(_sinkhorn_fwd, _sinkhorn_bwd)
