"""The coarse-to-fine STROTSS optimizer, compiled as jit + lax.scan.

Reference structure (``/root/reference/run_strotss.py:43-161``): a Python
loop over scales (64→128→256→512 long edge); per scale, 200 RMSprop steps on
the Laplacian-pyramid coefficients of the stylized image. The reference
round-trips gradients to the host **every step** (``tf.function`` returns
grads; ``opt.apply_gradients`` runs eagerly, ``run_strotss.py:147-148``).

Here the whole inner loop is a ``lax.scan`` whose body is
``sample → VGG forward → losses → grad → RMSprop update`` — zero host
crossings inside a scale except chunk-boundary metric reads. One jit trace
per scale (shapes change), like the reference's four retraces.

RMSprop matches Keras semantics exactly: ``v ← ρ v + (1-ρ) g²;
θ ← θ − lr·g/√(v+ε)`` with ρ=0.99, ε=1e-8 (``run_strotss.py:63``) — which is
``optax.rmsprop(lr, decay=0.99, eps=1e-8)`` (verified in
tests/test_solve.py). Optimizer slots restart at zero each scale because the
reference allocates fresh ``tf.Variable`` objects per scale
(``run_strotss.py:89``).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from strotss_tpu.config import StrotssConfig
from strotss_tpu.models.vgg import vgg_apply
from strotss_tpu.ops.image import (
    fold_laplacian_pyramid,
    make_laplacian,
    make_laplacian_pyramid,
    postprocess,
    resize_like,
    resize_max,
)
from strotss_tpu.ops.losses import content_loss, style_loss
from strotss_tpu.ops.sampling import (
    prepare_mask,
    sample_paired,
    sample_style,
)
from strotss_tpu.utils.logging import logger


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """TF/Keras-equivalent RMSprop (rho=0.99, eps=1e-8, eps inside sqrt)."""
    return optax.rmsprop(learning_rate=lr, decay=0.99, eps=1e-8)


def _extract_fn(vgg_params, cfg: StrotssConfig):
    """Image -> 10-entry hypercolumn list [image, tap1..tap9]."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    from strotss_tpu.models.vgg import STROTSS_DEFAULT_TAPS

    taps = cfg.taps or STROTSS_DEFAULT_TAPS

    def extract(img):
        feats = vgg_apply(
            vgg_params,
            img,
            taps=taps,
            vgg_type=cfg.vgg_type,
            preprocess_mode="keras" if cfg.use_keras_weight else "norm",
            compute_dtype=dtype,
        )
        return [img] + feats

    return extract


def build_scale_runner(
    vgg_params,
    cfg: StrotssConfig,
    content_feats: List[jnp.ndarray],
    style_targets: jnp.ndarray,
    alpha: float,
    lr: float,
    content_masks: Optional[jnp.ndarray] = None,
):
    """Build the jitted chunk runner for one scale.

    ``style_targets``: (n, C) unmasked, or (K, n, C) with ``content_masks``
    of shape (K, h, w) — one pre-thresholded validity map per region.
    Returns ``run_chunk(pyramid, opt_state, key, n_steps) -> (pyramid,
    opt_state, key, metrics(n_steps, 3))``.
    """
    extract = _extract_fn(vgg_params, cfg)
    opt = make_optimizer(lr)
    denom = 2.0 + alpha + 1.0 / max(alpha, 1.0)
    masked = content_masks is not None
    n_regions = int(content_masks.shape[0]) if masked else 0
    # the Pallas kernel path is used for the unmasked (single-transport)
    # loss; the masked path vmaps over regions and stays on the XLA impl.
    remd_impl = "pallas" if (cfg.use_pallas and not masked) else "xla"

    def loss_fn(pyramid, key):
        img = fold_laplacian_pyramid(pyramid)
        pred = extract(img)

        if masked:
            keys = jax.random.split(key, n_regions)

            def region(mask, target, k):
                c_feat, p_feat = sample_paired(
                    k, content_feats, pred, cfg.sample_size, mask
                )
                lc = content_loss(c_feat, p_feat)
                ls = style_loss(
                    target,
                    p_feat,
                    alpha,
                    use_sinkhorn=cfg.use_sinkhorn,
                    sinkhorn_lambda=cfg.sinkhorn_lambda,
                    sinkhorn_iters=cfg.sinkhorn_iters,
                    remd_impl=remd_impl,
                )
                return lc, ls

            lcs, lss = jax.vmap(region, in_axes=(0, 0, 0))(
                content_masks, style_targets, keys
            )
            loss = jnp.mean((alpha * lcs + lss) / denom)
            lc, ls = jnp.mean(lcs), jnp.mean(lss)
        else:
            c_feat, p_feat = sample_paired(
                key, content_feats, pred, cfg.sample_size
            )
            lc = content_loss(c_feat, p_feat)
            ls = style_loss(
                style_targets,
                p_feat,
                alpha,
                use_sinkhorn=cfg.use_sinkhorn,
                sinkhorn_lambda=cfg.sinkhorn_lambda,
                sinkhorn_iters=cfg.sinkhorn_iters,
                remd_impl=remd_impl,
            )
            loss = (alpha * lc + ls) / denom
        return loss, (lc, ls)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(carry, _):
        pyramid, opt_state, key = carry
        key, k_step = jax.random.split(key)
        (loss, (lc, ls)), grads = grad_fn(pyramid, k_step)
        updates, opt_state = opt.update(grads, opt_state)
        pyramid = optax.apply_updates(pyramid, updates)
        return (pyramid, opt_state, key), jnp.stack([loss, lc, ls])

    @partial(jax.jit, static_argnames=("n_steps",))
    def run_chunk(pyramid, opt_state, key, n_steps: int):
        (pyramid, opt_state, key), metrics = jax.lax.scan(
            step, (pyramid, opt_state, key), None, length=n_steps
        )
        return pyramid, opt_state, key, metrics

    return run_chunk, opt


def stylize_single(
    content: jnp.ndarray,
    style: jnp.ndarray,
    cfg: StrotssConfig,
    vgg_params,
    content_masks: Optional[jnp.ndarray] = None,
    style_masks: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    progress_cb: Optional[Callable[[int, int, int, Dict[str, float]], None]] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """Full coarse-to-fine stylization of one (content, style) pair.

    ``content``/``style``: (1,H,W,3) float [0,1]. Masks, if given, are
    (K,H,W,1) float region indicators (paired content/style regions, see
    ``strotss_tpu.ops.masks``). Returns (uint8 HWC image, info dict).
    """
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    use_mask = content_masks is not None
    extract = _extract_fn(vgg_params, cfg)
    extract_j = jax.jit(extract)

    alpha = cfg.initial_alpha()
    stylized = None
    info: Dict = {"scales": []}
    t_total = time.perf_counter()

    for i, scl in enumerate(cfg.scale_sizes()):
        t_scale = time.perf_counter()
        key, k_style, k_scale = jax.random.split(jax.random.fold_in(key, i), 3)

        scl_content = resize_max(content, scl)
        scl_style = resize_max(style, scl)
        laplacian = make_laplacian(scl_content)

        # init rules, run_strotss.py:81-88
        if i == 0:
            stylized = laplacian + jnp.mean(scl_style, axis=(1, 2), keepdims=True)
        elif i < cfg.levels - 1:
            stylized = resize_like(stylized, scl_content) + laplacian
        else:
            stylized = resize_like(stylized, scl_content)
        lr = cfg.lr / 2 if (i == cfg.levels - 1 and i > 0) else cfg.lr

        pyramid = make_laplacian_pyramid(stylized, cfg.pyramid_levels)

        content_feats = extract_j(scl_content)
        style_feats = extract_j(scl_style)

        ch, cw = scl_content.shape[1], scl_content.shape[2]
        sh, sw = scl_style.shape[1], scl_style.shape[2]
        if use_mask:
            cmasks = jnp.stack(
                [prepare_mask(m, (ch, cw)) for m in content_masks]
            )
            smasks = [prepare_mask(m, (sh, sw)) for m in style_masks]
            style_targets = jnp.stack(
                [
                    sample_style(
                        jax.random.fold_in(k_style, r),
                        style_feats,
                        cfg.sample_size,
                        sm,
                    )
                    for r, sm in enumerate(smasks)
                ]
            )
        else:
            cmasks = None
            style_targets = sample_style(k_style, style_feats, cfg.sample_size)

        run_chunk, opt = build_scale_runner(
            vgg_params, cfg, content_feats, style_targets, alpha, lr, cmasks
        )
        opt_state = opt.init(pyramid)

        done = 0
        last = {}
        k_run = k_scale
        while done < cfg.max_iter:
            n = min(cfg.log_every, cfg.max_iter - done)
            pyramid, opt_state, k_run, metrics = run_chunk(
                pyramid, opt_state, k_run, n
            )
            done += n
            m = jax.device_get(metrics[-1])
            last = {"loss": float(m[0]), "loss_c": float(m[1]), "loss_s": float(m[2])}
            if progress_cb is not None:
                progress_cb(scl, done, cfg.max_iter, last)

        stylized = fold_laplacian_pyramid(pyramid)
        jax.block_until_ready(stylized)
        info["scales"].append(
            {
                "scale": scl,
                "alpha": alpha,
                "seconds": time.perf_counter() - t_scale,
                **last,
            }
        )
        alpha /= 2.0

    final = postprocess(stylized)
    info["seconds"] = time.perf_counter() - t_total
    return final, info
