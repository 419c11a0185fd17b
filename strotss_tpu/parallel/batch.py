"""Batched stylization: vmap over (content, style) pairs + mesh sharding.

The reference is hard-wired to batch 1 (``/root/reference/nn/utils.py:55-65``
adds/asserts the singleton batch dim). Stylizations are independent, so the
TPU-native scaling story is: stack B pairs, vmap the per-scale train step
over the pair axis, and shard that axis over the mesh's ``data`` axis —
XLA then runs B independent VGG/loss pipelines with zero per-step
communication (losses are per-pair; no cross-pair reduction exists).

All images in a batch share one shape bucket (pad/resize on the host
first). The chunk runner is one module-level jit (static spec + mesh), so
repeated batches of the same bucket reuse the compile cache.
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
from strotss_tpu.ops.image import fold_laplacian_pyramid, postprocess
from strotss_tpu.ops.losses import content_loss, style_loss
from strotss_tpu.ops.sampling import sample_paired, sample_style
from strotss_tpu.solve import (
    StepSpec,
    _scale_init_j,
    extract_hypercolumn,
    make_optimizer,
    chunk_plan,
    init_opt_state,
    resize_max_hw,
    spec_from_config,
)


def _constrain(tree, mesh: Optional[Mesh], spec: P):
    if mesh is None:
        return tree
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec)),
        tree,
    )


@partial(jax.jit, static_argnames=("spec",))
def _style_targets_batch_j(spec: StepSpec, key, style_feats):
    batch = style_feats[0].shape[0]
    return jax.vmap(
        lambda f, k: sample_style(k, f, spec.sample_size)
    )(style_feats, jax.random.split(key, batch))


@partial(
    jax.jit,
    static_argnames=("spec", "n_steps", "mesh"),
    donate_argnames=("pyramid", "opt_state", "key"),
)
def run_chunk_batch(
    spec: StepSpec,
    n_steps: int,
    mesh: Optional[Mesh],
    vgg_params,
    content_feats,
    style_targets,
    pyramid,
    opt_state,
    key,
    alpha,
    lr,
):
    """``n_steps`` steps of the batched optimization as one on-device scan."""
    opt = make_optimizer(lr)
    batch = style_targets.shape[0]
    denom = 2.0 + alpha + 1.0 / jnp.maximum(alpha, 1.0)

    def per_pair(cf, pf, target, k):
        c_feat, p_feat = sample_paired(k, cf, pf, spec.sample_size)
        lc = content_loss(c_feat, p_feat)
        ls = style_loss(
            target,
            p_feat,
            alpha,
            use_sinkhorn=spec.use_sinkhorn,
            sinkhorn_lambda=spec.sinkhorn_lambda,
            sinkhorn_iters=spec.sinkhorn_iters,
            remd_impl="xla",  # vmapped: XLA impl composes with batching
        )
        return lc, ls

    def loss_fn(pyr, k):
        img = fold_laplacian_pyramid(pyr)
        img = _constrain(img, mesh, P("data"))
        pred = extract_hypercolumn(spec, vgg_params, img)
        keys = jax.random.split(k, batch)
        lcs, lss = jax.vmap(per_pair, in_axes=(0, 0, 0, 0))(
            content_feats, pred, style_targets, keys
        )
        loss = jnp.mean((alpha * lcs + lss) / denom)
        return loss, (jnp.mean(lcs), jnp.mean(lss))

    def step(carry, _):
        pyr, ostate, k = carry
        k, k_step = jax.random.split(k)
        (loss, (lc, ls)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(pyr, k_step)
        updates, ostate = opt.update(grads, ostate)
        pyr = optax.apply_updates(pyr, updates)
        pyr = _constrain(pyr, mesh, P("data"))
        return (pyr, ostate, k), jnp.stack([loss, lc, ls])

    (pyramid, opt_state, key), metrics = jax.lax.scan(
        step, (pyramid, opt_state, key), None, length=n_steps
    )
    return pyramid, opt_state, key, metrics


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
    spec = spec_from_config(cfg)

    def shard(x):
        if mesh is None:
            return x
        return jax.device_put(x, NamedSharding(mesh, P("data")))

    contents = shard(contents)
    styles = shard(styles)

    alpha = cfg.initial_alpha()
    stylized = None
    info: Dict = {"scales": [], "batch": int(contents.shape[0])}
    t_total = time.perf_counter()

    for i, scl in enumerate(cfg.scale_sizes()):
        t_scale = time.perf_counter()
        key, k_style, k_run = jax.random.split(jax.random.fold_in(key, i), 3)

        chw = resize_max_hw(contents.shape[1], contents.shape[2], scl)
        shw = resize_max_hw(styles.shape[1], styles.shape[2], scl)
        mode = "first" if i == 0 else ("mid" if i < cfg.levels - 1 else "last")
        scl_content, scl_style, pyramid = _scale_init_j(
            mode, chw, shw, cfg.pyramid_levels, contents, styles,
            stylized if stylized is not None else contents,
        )
        lr = cfg.lr / 2 if (i == cfg.levels - 1 and i > 0) else cfg.lr

        from strotss_tpu.solve import _extract_j

        content_feats = _extract_j(spec, vgg_params, scl_content)
        style_feats = _extract_j(spec, vgg_params, scl_style)
        style_targets = _style_targets_batch_j(spec, k_style, style_feats)

        opt_state = init_opt_state(lr, pyramid)
        alpha_t = jnp.asarray(alpha, jnp.float32)
        lr_t = jnp.asarray(lr, jnp.float32)

        done = 0
        last: Dict[str, float] = {}
        for n in chunk_plan(cfg.max_iter, cfg.log_every):
            pyramid, opt_state, k_run, metrics = run_chunk_batch(
                spec, n, mesh, vgg_params, content_feats, style_targets,
                pyramid, opt_state, k_run, alpha_t, lr_t,
            )
            done += n
            m = jax.device_get(metrics[-1])
            last = {"loss": float(m[0]), "loss_c": float(m[1]),
                    "loss_s": float(m[2])}
            if progress_cb is not None:
                progress_cb(scl, done, cfg.max_iter, last)

        stylized = fold_laplacian_pyramid(pyramid)
        jax.block_until_ready(stylized)
        info["scales"].append(
            {"scale": scl, "seconds": time.perf_counter() - t_scale, **last}
        )
        alpha /= 2.0

    final = jax.jit(jax.vmap(lambda im: postprocess(im[None])))(stylized)
    info["seconds"] = time.perf_counter() - t_total
    return final, info
