"""STROTSS losses: distances, relaxed EMD, self-similarity, moments, Sinkhorn.

Loss-equivalence contract with the reference (``/root/reference/nn/losses.py``):

- ``cosine_distance``: rows l2-normalized with floor 1e-12, ``1 - x̂ ŷᵀ``
  (``nn/losses.py:12-15``).
- ``l2_distance``: squared-expansion pairwise distance, floored at 1e-6,
  divided by the channel count, then sqrt (``nn/losses.py:18-24``).
- ``self_similarity``: each self-cosine matrix is column-sum-normalized with
  floor 1e-12; MAE between them scaled by the row count
  (``nn/losses.py:55-66``).
- ``moment_matching``: MAE of means + MAE of biased covariances
  (``nn/losses.py:39-52``).
- ``relaxed_emd``: ``max(mean(row-min C), mean(col-min C))``
  (``nn/losses.py:69-80``).
- ``sinkhorn``: a *working* entropic OT (the reference's is dead code and
  buggy — builds its scaling vectors from a shape tensor,
  ``nn/losses.py:83-105``).

Everything is pure jnp in float32, fused by XLA; ``relaxed_emd`` can route
the cost-matrix + min reduction through a Pallas kernel that never
materializes N x M in HBM (``strotss_tpu/ops/kernels/remd.py``) for large N.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from strotss_tpu.ops.image import rgb_to_yuv

_L2NORM_EPS = 1e-12
_L2DIST_EPS = 1e-6
_COLSUM_EPS = 1e-12


def mse(x, y, axis=None, keepdims=False):
    return jnp.mean(jnp.square(x - y), axis=axis, keepdims=keepdims)


def mae(x, y, axis=None, keepdims=False):
    return jnp.mean(jnp.abs(x - y), axis=axis, keepdims=keepdims)


def _f32(x):
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


def reshape_2d(x: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
    """Flatten any tensor to (N, C) with C from ``channel_axis``.

    Parity with the reference's ``reshape_2d`` (``nn/losses.py:31-36``),
    whose rank-2 fast path never triggered (it compared a dims list to an
    int); flattening is idempotent for 2-D input so behavior is identical.
    """
    if x.ndim == 2:
        return x
    x = jnp.squeeze(x)
    if x.ndim == 2:
        return x
    return x.reshape(-1, x.shape[channel_axis])


# Matmul precision contract: 'highest' = exact f32 (6-pass bf16 on the MXU);
# 'high' = 3-pass bf16 (~1e-6 relative error) — selected by the step spec
# under bfloat16 features, whose own quantization noise (~1e-3) dwarfs the
# matmul rounding, for ~2x faster loss matmuls.
def l2_normalize_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Row-normalize like ``tf.nn.l2_normalize(x, axis=1)`` (eps 1e-12)."""
    sq = jnp.sum(jnp.square(x), axis=1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, _L2NORM_EPS))


def cosine_distance(
    x: jnp.ndarray, y: jnp.ndarray, precision: str = "highest"
) -> jnp.ndarray:
    """Pairwise cosine distance matrix ``1 - x̂ ŷᵀ`` of shape (N, M)."""
    x, y = _f32(x), _f32(y)
    return 1.0 - jnp.matmul(
        l2_normalize_rows(x), l2_normalize_rows(y).T, precision=precision
    )


def l2_distance(
    x: jnp.ndarray, y: jnp.ndarray, precision: str = "highest"
) -> jnp.ndarray:
    """Channel-normalized pairwise L2 distance matrix of shape (N, M)."""
    x, y = _f32(x), _f32(y)
    x_sq = jnp.sum(jnp.square(x), axis=1)[:, None]
    y_sq = jnp.sum(jnp.square(y), axis=1)[None, :]
    m = x_sq + y_sq - 2.0 * jnp.matmul(x, y.T, precision=precision)
    m = jnp.maximum(m, _L2DIST_EPS) / x.shape[1]
    return jnp.sqrt(m)


def both_distance(
    x: jnp.ndarray, y: jnp.ndarray, precision: str = "highest"
) -> jnp.ndarray:
    return cosine_distance(x, y, precision) + l2_distance(x, y, precision)


dist_metrics = {
    "cosine": cosine_distance,
    "l2": l2_distance,
    "both": both_distance,
}


def moment_stats(
    x: jnp.ndarray, precision: str = "highest"
) -> tuple:
    """(mean (1,C), biased covariance (C,C)) of the rows of ``x``.

    The target-side half of :func:`moment_matching`. Style targets are
    constant within a scale (``run_strotss.py:27-41,128``: ``StyleLoss``
    samples its target once per scale), so the solver hoists this C x C
    (~2179²) Gram build out of the step scan and reuses it for all steps —
    exact, and it halves the moment-matching matmul cost per step.
    """
    x = reshape_2d(_f32(x))
    xm = jnp.mean(x, axis=0, keepdims=True)
    cx = x - xm
    xv = jnp.matmul(cx.T, cx, precision=precision) / x.shape[0]
    return xm, xv


def moment_matching_from_stats(
    stats: tuple, y: jnp.ndarray, precision: str = "highest"
) -> jnp.ndarray:
    """:func:`moment_matching` with the x-side stats precomputed."""
    xm, xv = stats
    ym, yv = moment_stats(y, precision)
    return mae(xv, yv) + mae(xm, ym)


def moment_matching(
    x: jnp.ndarray, y: jnp.ndarray, precision: str = "highest"
) -> jnp.ndarray:
    """MAE(mean_x, mean_y) + MAE(cov_x, cov_y) with biased covariance.

    For the default hypercolumn this is a C x C (~2179²) Gram build — two
    MXU matmuls.
    """
    return moment_matching_from_stats(moment_stats(x, precision), y, precision)


def self_similarity(
    x: jnp.ndarray, y: jnp.ndarray, impl: str = "auto",
    precision: str = "highest",
) -> jnp.ndarray:
    """STROTSS content loss: compare column-normalized self-cosine matrices.

    Called with (prediction, content-target) like the reference's
    ``ContentLoss`` (``run_strotss.py:21-24``). ``impl='pallas'`` streams
    tiles instead of materializing the two N x N matrices
    (``ops/kernels/selfsim.py``); ``'auto'`` switches to it at N >= 4096
    where XLA's N² buffers start to hurt.
    """
    x, y = reshape_2d(_f32(x)), reshape_2d(_f32(y))
    if impl == "auto":
        impl = "pallas" if (
            x.shape[0] >= 4096 and x.shape == y.shape
        ) else "xla"
    if impl == "pallas":
        from strotss_tpu.ops.kernels.selfsim import self_similarity_pallas

        interpret = jax.default_backend() != "tpu"
        return self_similarity_pallas(x, y, interpret)
    x_dist = cosine_distance(x, x, precision)
    x_dist = x_dist / jnp.maximum(jnp.sum(x_dist, axis=0), _COLSUM_EPS)
    y_dist = cosine_distance(y, y, precision)
    y_dist = y_dist / jnp.maximum(jnp.sum(y_dist, axis=0), _COLSUM_EPS)
    return mae(x_dist, y_dist) * y.shape[0]


def relaxed_emd(
    x: jnp.ndarray,
    y: jnp.ndarray,
    distance: str = "cosine",
    impl: str = "xla",
    precision: str = "highest",
) -> jnp.ndarray:
    """Relaxed earth mover's distance: max of the two one-sided matching costs.

    ``impl='pallas'`` streams the cost matrix through VMEM tiles with online
    row/col minima (no N x M HBM tensor); gradients flow through an exact
    argmin-gather custom VJP. ``impl='xla'`` materializes C — optimal for the
    default N=1024 where C is 4 MB and XLA fuses everything.
    ``impl='auto'`` picks by problem size: measured on v5e, XLA wins below
    ~2048² (fixed kernel overheads dominate) and the tiled kernel wins once
    the cost matrix stops fitting comfortably in HBM traffic.
    """
    x, y = reshape_2d(_f32(x)), reshape_2d(_f32(y))
    if impl == "auto":
        impl = "pallas" if (x.shape[0] * y.shape[0] >= 2048 * 2048) else "xla"
    if impl == "pallas":
        from strotss_tpu.ops.kernels.remd import relaxed_emd_pallas

        return relaxed_emd_pallas(x, y, distance=distance)
    c = dist_metrics[distance](x, y, precision)
    r_x = jnp.mean(jnp.min(c, axis=1))
    r_y = jnp.mean(jnp.min(c, axis=0))
    return jnp.maximum(r_x, r_y)


@partial(jax.jit, static_argnames=("distance", "lam", "n_iter", "impl"))
def sinkhorn(
    x: jnp.ndarray,
    y: jnp.ndarray,
    distance: str = "cosine",
    lam: float = 10.0,
    n_iter: int = 30,
    impl: str = "auto",
) -> jnp.ndarray:
    """Entropic-regularized full OT cost via Sinkhorn-Knopp iterations.

    A working replacement for the reference's dead/buggy ``sinkhorn_knopp``
    (``nn/losses.py:83-105``): uniform marginals, kernel ``K = exp(-λM)``,
    alternating scaling updates, returning ``<T, M>`` with the plan
    ``T = diag(u) K diag(v)``. Runs in the **log domain** (logsumexp
    updates), so it stays exact for large λ where ``exp(-λM)`` underflows —
    equivalent to the scaling form in exact arithmetic.

    ``impl='pallas'`` streams the iterations through tiled flash-LSE passes
    with **no N x M buffer at all** (``ops/kernels/sinkhorn.py``; gradient =
    converged-plan Danskin estimator). ``'auto'`` keeps the materialized
    XLA path everywhere it *fits*: measured on v5e
    (``tools/bench_sinkhorn.py``, val+grad, C=2179, 30 iters), XLA wins at
    every size it can run — 3.8/16.1/152/603 ms at N=2048/4096/8192/16384
    vs 57/228/922/3603 ms streamed. There is **no speed crossover**: the
    streamed kernel rebuilds the cost tiles 2x per iteration (~60x the
    matmul FLOPs of building the cost matrix once), which is the price of
    O((N+M)C) memory. It is a *capacity* feature, so the auto gate is a
    memory gate: engage streaming once the f32 cost matrix would exceed
    ~4 GB (N*M > 2**30 entries, i.e. beyond ~32k x 32k samples) — the XLA
    path keeps ~3 N x M live buffers (cost, log-kernel, transport plan in
    backward), which at that size exhausts the chip's 16 GB HBM
    (``tools/bench_sinkhorn_capacity.py``).

    **Gradient-semantics caveat for 'auto'**: the XLA path differentiates
    through the unrolled iterations exactly; the streamed kernel returns
    the converged-plan Danskin gradient (``<T*, dM>``) — the correct
    limit-gradient, but not identical to the unrolled one at finite
    ``n_iter`` (measured cosine ~0.9 at n_iter=30, tests/test_kernels.py).
    Crossing the auto threshold therefore changes the gradient *estimator*,
    not just the implementation; pin ``impl`` explicitly if that matters.

    ``lam`` is a **static** argument (a Python float, constant per config):
    the streamed kernel bakes it into the tile program, so a traced ``lam``
    raises jit's clear non-hashable-static error instead of the
    ``UnexpectedTracerError`` it produced before lam was marked static.
    """
    x, y = reshape_2d(_f32(x)), reshape_2d(_f32(y))
    if impl == "auto":
        # memory gate, not a speed crossover (see docstring): stream once
        # the materialized path's ~3 NxM f32 buffers would exhaust HBM
        impl = "pallas" if x.shape[0] * y.shape[0] > 2 ** 30 else "xla"
    if impl == "pallas":
        from strotss_tpu.ops.kernels.sinkhorn import sinkhorn_streamed

        interpret = jax.default_backend() != "tpu"
        return sinkhorn_streamed(x, y, distance, lam, n_iter, interpret)
    m = dist_metrics[distance](x, y)
    n, mm = m.shape
    log_k = -lam * m
    log_p = jnp.full((n,), -jnp.log(float(n)), dtype=m.dtype)
    log_q = jnp.full((mm,), -jnp.log(float(mm)), dtype=m.dtype)
    log_u = jnp.zeros((n,), dtype=m.dtype)
    log_v = jnp.zeros((mm,), dtype=m.dtype)

    # remat the iteration: without it the scan backward saves an N x N
    # logsumexp residual per iteration (8 GB at N=8192, 30 iters)
    @jax.checkpoint
    def body(carry, _):
        log_u, log_v = carry
        log_u = log_p - jax.nn.logsumexp(log_k + log_v[None, :], axis=1)
        log_v = log_q - jax.nn.logsumexp(log_k + log_u[:, None], axis=0)
        return (log_u, log_v), None

    (log_u, log_v), _ = jax.lax.scan(body, (log_u, log_v), None, length=n_iter)
    log_t = log_u[:, None] + log_k + log_v[None, :]
    return jnp.sum(jnp.exp(log_t) * m)


def style_loss(
    target: jnp.ndarray,
    prediction: jnp.ndarray,
    alpha: float,
    use_sinkhorn: bool = False,
    sinkhorn_lambda: float = 10.0,
    sinkhorn_iters: int = 30,
    remd_impl: str = "xla",
    precision: str = "highest",
    target_moments: Optional[tuple] = None,
) -> jnp.ndarray:
    """The composite style loss of the reference's ``StyleLoss`` module.

    ``moments + REMD(cosine) + (1/max(α,1)) · REMD(YUV-of-RGB, 'both')``
    (``run_strotss.py:27-41``). ``use_sinkhorn`` swaps both transport terms
    for full entropic OT (the high-res capability the reference stubbed out).
    ``target_moments``: optional precomputed :func:`moment_stats` of
    ``target`` — the solver hoists them out of the step scan (targets are
    per-scale constants); passing them here is numerically identical to
    recomputing.
    """
    # alpha may be a traced scalar (the per-scale schedule is dynamic)
    inv_alpha = 1.0 / jnp.maximum(alpha, 1.0)
    if target_moments is None:
        target_moments = moment_stats(target, precision)
    l_m = moment_matching_from_stats(target_moments, prediction, precision)
    if use_sinkhorn:
        # remd_impl carries the same gating contract (masked vmap and
        # sample-sharded paths force 'xla'; 'auto' picks by problem size)
        l_t = sinkhorn(target, prediction, "cosine", sinkhorn_lambda,
                       sinkhorn_iters, impl=remd_impl)
        l_p = sinkhorn(
            rgb_to_yuv(_f32(target)), rgb_to_yuv(_f32(prediction)),
            "both", sinkhorn_lambda, sinkhorn_iters, impl=remd_impl,
        )
    else:
        l_t = relaxed_emd(target, prediction, "cosine", impl=remd_impl,
                          precision=precision)
        l_p = relaxed_emd(
            rgb_to_yuv(_f32(target)), rgb_to_yuv(_f32(prediction)),
            "both", impl=remd_impl, precision=precision,
        )
    return l_m + l_t + inv_alpha * l_p


def content_loss(
    target: jnp.ndarray, prediction: jnp.ndarray, impl: str = "auto",
    precision: str = "highest",
) -> jnp.ndarray:
    """Reference ``ContentLoss``: self-similarity of (prediction, target).

    ``impl`` threads the StepSpec gating through (the masked vmap path must
    force 'xla': vmap over the Pallas custom_vjp may not batch on TPU).
    """
    return self_similarity(prediction, target, impl=impl,
                           precision=precision)
