"""Batched stylization: vmap over (content, style) pairs + mesh sharding.

The reference is hard-wired to batch 1 (``/root/reference/nn/utils.py:55-65``
adds/asserts the singleton batch dim). Stylizations are independent, so the
TPU-native scaling story is: stack B pairs, vmap the per-scale train step
over the pair axis, and shard that axis over the mesh's ``data`` axis —
XLA then runs B independent VGG/loss pipelines with zero per-step
communication (gradients are per-pair; there is no cross-pair reduction).

All images in a batch share one shape bucket (pad/resize on the host first).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from strotss_tpu.config import StrotssConfig
from strotss_tpu.models.weights import load_vgg_params
from strotss_tpu.ops.image import (
    fold_laplacian_pyramid,
    make_laplacian,
    make_laplacian_pyramid,
    postprocess,
    resize_bilinear,
    resize_like,
    resize_max,
)
from strotss_tpu.ops.losses import content_loss, style_loss
from strotss_tpu.ops.sampling import sample_paired, sample_style
from strotss_tpu.solve import _extract_fn, make_optimizer


def _constrain(tree, mesh: Optional[Mesh], spec: P):
    if mesh is None:
        return tree
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec)),
        tree,
    )


def build_batch_scale_runner(
    vgg_params,
    cfg: StrotssConfig,
    content_feats,  # list of (B, h, w, c)
    style_targets: jnp.ndarray,  # (B, n, C)
    alpha: float,
    lr: float,
    mesh: Optional[Mesh] = None,
):
    """Jitted chunk runner for one scale of a B-pair batch.

    Loss per pair is the same as the single path; the batch loss is the
    mean (grads are per-pair since pairs don't interact).
    """
    extract = _extract_fn(vgg_params, cfg)
    opt = make_optimizer(lr)
    denom = 2.0 + alpha + 1.0 / max(alpha, 1.0)
    batch = style_targets.shape[0]

    def per_pair(cfeats, pfeats, target, key):
        c_feat, p_feat = sample_paired(key, cfeats, pfeats, cfg.sample_size)
        lc = content_loss(c_feat, p_feat)
        ls = style_loss(
            target,
            p_feat,
            alpha,
            use_sinkhorn=cfg.use_sinkhorn,
            sinkhorn_lambda=cfg.sinkhorn_lambda,
            sinkhorn_iters=cfg.sinkhorn_iters,
            remd_impl="xla",
        )
        return lc, ls

    def loss_fn(pyramid, key):
        img = fold_laplacian_pyramid(pyramid)
        img = _constrain(img, mesh, P("data"))
        pred = extract(img)
        keys = jax.random.split(key, batch)
        lcs, lss = jax.vmap(per_pair, in_axes=(0, 0, 0, 0))(
            content_feats, pred, style_targets, keys
        )
        per_pair_loss = (alpha * lcs + lss) / denom
        return jnp.mean(per_pair_loss), (jnp.mean(lcs), jnp.mean(lss))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(carry, _):
        pyramid, opt_state, key = carry
        key, k_step = jax.random.split(key)
        (loss, (lc, ls)), grads = grad_fn(pyramid, k_step)
        updates, opt_state = opt.update(grads, opt_state)
        pyramid = optax.apply_updates(pyramid, updates)
        pyramid = _constrain(pyramid, mesh, P("data"))
        return (pyramid, opt_state, key), jnp.stack([loss, lc, ls])

    @partial(jax.jit, static_argnames=("n_steps",))
    def run_chunk(pyramid, opt_state, key, n_steps: int):
        (pyramid, opt_state, key), metrics = jax.lax.scan(
            step, (pyramid, opt_state, key), None, length=n_steps
        )
        return pyramid, opt_state, key, metrics

    return run_chunk, opt


def stylize_batch(
    contents: jnp.ndarray,
    styles: jnp.ndarray,
    cfg: Optional[StrotssConfig] = None,
    vgg_params=None,
    mesh: Optional[Mesh] = None,
    key: Optional[jax.Array] = None,
    progress_cb=None,
) -> Tuple[jnp.ndarray, Dict]:
    """Coarse-to-fine stylization of B pairs at once.

    ``contents``/``styles``: (B, H, W, 3) float [0,1], one shape bucket.
    With ``mesh``, the pair axis is sharded over the mesh's ``data`` axis.
    Returns ((B, H', W', 3) uint8, info).
    """
    cfg = cfg or StrotssConfig()
    if vgg_params is None:
        vgg_params = load_vgg_params(cfg.vgg_type, cfg.use_keras_weight)
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    batch = contents.shape[0]

    extract = jax.jit(_extract_fn(vgg_params, cfg))
    data_sharding = (
        NamedSharding(mesh, P("data")) if mesh is not None else None
    )

    def shard(x):
        return jax.device_put(x, data_sharding) if data_sharding is not None else x

    alpha = cfg.initial_alpha()
    stylized = None
    info: Dict = {"scales": [], "batch": batch}
    t_total = time.perf_counter()

    for i, scl in enumerate(cfg.scale_sizes()):
        t_scale = time.perf_counter()
        key, k_style, k_run = jax.random.split(jax.random.fold_in(key, i), 3)

        scl_content = shard(resize_max(contents, scl))
        scl_style = shard(resize_max(styles, scl))
        laplacian = make_laplacian(scl_content)

        if i == 0:
            stylized = laplacian + jnp.mean(scl_style, axis=(1, 2), keepdims=True)
        elif i < cfg.levels - 1:
            stylized = resize_like(stylized, scl_content) + laplacian
        else:
            stylized = resize_like(stylized, scl_content)
        lr = cfg.lr / 2 if (i == cfg.levels - 1 and i > 0) else cfg.lr

        pyramid = make_laplacian_pyramid(stylized, cfg.pyramid_levels)
        content_feats = extract(scl_content)
        style_feats = extract(scl_style)

        style_targets = jax.vmap(
            lambda feats, k: sample_style(k, feats, cfg.sample_size)
        )(style_feats, jax.random.split(k_style, batch))

        run_chunk, opt = build_batch_scale_runner(
            vgg_params, cfg, content_feats, style_targets, alpha, lr, mesh
        )
        opt_state = opt.init(pyramid)

        done = 0
        last = {}
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
            {"scale": scl, "seconds": time.perf_counter() - t_scale, **last}
        )
        alpha /= 2.0

    final = jax.vmap(lambda im: postprocess(im[None]))(stylized)
    info["seconds"] = time.perf_counter() - t_total
    return final, info
