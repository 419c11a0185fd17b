"""Region-mask loading and partition (host-side numpy).

Semantics of the reference ``load_mask``
(``/root/reference/nn/strotss_utils.py:178-201``): both mask images are
color-quantized by ``// 255 * 255`` (each channel snaps to {0, 255}, so at
most 8 region colors); a color defines a region pair iff it covers at least
``sample_threth`` (10000) pixels in the *content* mask and appears at all in
the *style* mask; the output is two aligned lists of binary float (H,W,1)
masks. Raises when no region survives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from strotss_tpu.utils.io import load_image


def partition_masks(
    c_mask: np.ndarray,
    s_mask: np.ndarray,
    pixel_threth: int = 255,
    sample_threth: int = 10000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Partition quantized mask colors into paired binary region masks.

    Inputs are (H,W,3) uint8 arrays. Returns two stacked (K,H,W,1) float32
    arrays (content regions, style regions) with matching region order.
    """
    c_mask = (c_mask.astype(np.int64) // pixel_threth * pixel_threth).astype(np.uint8)
    s_mask = (s_mask.astype(np.int64) // pixel_threth * pixel_threth).astype(np.uint8)

    uniques, counts = np.unique(c_mask.reshape(-1, 3), axis=0, return_counts=True)
    uniques = uniques[counts >= sample_threth]

    c_ret, s_ret = [], []
    for color in uniques:
        c_cond = np.all(c_mask == color[None, None, :], axis=-1)
        s_cond = np.all(s_mask == color[None, None, :], axis=-1)
        if c_cond.any() and s_cond.any():
            c_ret.append(c_cond.astype(np.float32)[..., None])
            s_ret.append(s_cond.astype(np.float32)[..., None])
    if not c_ret:
        raise Exception("No mask found")
    return jnp.asarray(np.stack(c_ret)), jnp.asarray(np.stack(s_ret))


def load_mask(
    content_path: str,
    style_path: str,
    max_size: Optional[int] = None,
    pixel_threth: int = 255,
    sample_threth: int = 10000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Load + quantize + partition a content/style mask image pair."""
    c = np.asarray(load_image(content_path, max_size, dtype=jnp.uint8, batch_expand=False))
    s = np.asarray(load_image(style_path, max_size, dtype=jnp.uint8, batch_expand=False))
    return partition_masks(c, s, pixel_threth, sample_threth)
