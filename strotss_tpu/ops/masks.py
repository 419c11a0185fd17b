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


def _load_quantized(path: str, max_size: Optional[int],
                    pixel_threth: int) -> np.ndarray:
    """Load one mask image, resized and quantized with reference semantics.

    The reference's ``load_image(dtype=uint8, max_size)`` goes through
    ``tf.image.resize``, which returns FLOAT values for uint8 input
    (``nn/utils.py:44-57``), and ``load_mask`` floor-quantizes those floats
    (``// 255 * 255``, ``nn/strotss_utils.py:180-183``) — so an interpolated
    boundary pixel of e.g. 254.7 maps to 0, NOT 255. Rounding the resized
    float back to uint8 first (the old path here) admitted every >= 254.5
    pixel into the 255 region, silently shifting region membership (and the
    10000-px area counts) at anti-aliased mask edges. So: resize in float,
    floor-quantize the float, and only then cast (the quantized values are
    exact multiples of ``pixel_threth`` <= 255, so the cast is lossless).
    """
    raw = np.asarray(
        load_image(path, None, dtype=jnp.uint8, batch_expand=False)
    )
    if max_size is None:
        return raw
    from strotss_tpu.ops.image import resize_max

    f = np.asarray(resize_max(jnp.asarray(raw, jnp.float32), max_size))
    return (np.floor_divide(f, pixel_threth) * pixel_threth).astype(np.uint8)


def load_mask(
    content_path: str,
    style_path: str,
    max_size: Optional[int] = None,
    pixel_threth: int = 255,
    sample_threth: int = 10000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Load + quantize + partition a content/style mask image pair."""
    c = _load_quantized(content_path, max_size, pixel_threth)
    s = _load_quantized(style_path, max_size, pixel_threth)
    return partition_masks(c, s, pixel_threth, sample_threth)
