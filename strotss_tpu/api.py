"""High-level library API: one call = one stylization."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from strotss_tpu.config import StrotssConfig
from strotss_tpu.models.weights import load_vgg_params
from strotss_tpu.solve import stylize_single


def stylize(
    content: jnp.ndarray,
    style: jnp.ndarray,
    cfg: Optional[StrotssConfig] = None,
    content_masks: Optional[jnp.ndarray] = None,
    style_masks: Optional[jnp.ndarray] = None,
    vgg_params=None,
    key: Optional[jax.Array] = None,
    progress_cb=None,
    snapshot_cb=None,
    mesh=None,
    init_image: Optional[jnp.ndarray] = None,
    style_weights=None,
) -> Tuple[jnp.ndarray, Dict]:
    """Stylize ``content`` with ``style`` (both (1,H,W,3) float in [0,1]).

    Returns the uint8 HWC stylized image and an info dict with per-scale
    losses and timings. See :class:`strotss_tpu.StrotssConfig` for knobs.
    ``mesh``: optional ``jax.sharding.Mesh`` — a 'sample' axis partitions
    the transport losses under ``cfg.shard_samples``; a 'spatial' axis
    partitions the conv stack of a single high-res stylization under
    ``cfg.shard_spatial`` (the two compose on a 2-D mesh).
    ``init_image``: optional (1,H,W,3) float [0,1] warm start — the first
    executed scale seeds from it instead of the cold content+style-mean
    seed (any resolution; it gets exactly ONE bilinear resize, directly to
    that scale's resolution — do not pre-resize, composed resamples
    perturb refinement chains). Feed a finished result back in to refine
    it, or the previous frame's output for frame-coherent video
    stylization.
    ``style`` may be a list/tuple of style images with ``style_weights``
    (one weight per style): multi-style blending — the style target is a
    weighted mixture of full-grid samples from each style (see
    :func:`strotss_tpu.solve.style_sample_counts`). Weights of 0 drop
    their style exactly — and so does any weight small enough that its
    largest-remainder share of ``cfg.sample_size`` samples rounds to 0
    (e.g. 0.004 of 1024 under an 0.996 partner; a warning is logged).
    Incompatible with region masks.
    """
    from strotss_tpu.validation import check_image, check_masks

    check_image("content", content)
    if isinstance(style, (list, tuple)):
        for i, s in enumerate(style):
            check_image(f"style[{i}]", s)
    else:
        check_image("style", style)
    if init_image is not None:
        check_image("init_image", init_image)
    check_masks(content_masks, style_masks)
    cfg = cfg or StrotssConfig()
    if vgg_params is None:
        vgg_params = load_vgg_params(cfg.vgg_type, cfg.use_keras_weight)
    return stylize_single(
        content,
        style,
        cfg,
        vgg_params,
        content_masks=content_masks,
        style_masks=style_masks,
        key=key,
        progress_cb=progress_cb,
        snapshot_cb=snapshot_cb,
        mesh=mesh,
        init_image=init_image,
        style_weights=style_weights,
    )
