"""Image-space ops: bilinear resize, Laplacian pyramid, color, postprocess.

All functions are pure jnp on NHWC float tensors and safe under ``jit``.

Numerical contract: ``resize_bilinear`` reproduces TensorFlow's default
bilinear resize (half-pixel centers, **no antialiasing**) bit-close —
``jax.image.resize(..., antialias=False)`` matches ``tf.image.resize`` to
~1e-7 (verified in tests/test_image_ops.py). This matters because the
Laplacian pyramid parameterization (reference
``/root/reference/nn/strotss_utils.py:139-163``) and the mask thresholds are
built from chained resizes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# tf.image.rgb_to_yuv kernel (BT.601), the exact constants TF uses.
_RGB_TO_YUV = [
    [0.299, -0.14714119, 0.61497538],
    [0.587, -0.28886916, -0.51496512],
    [0.114, 0.43601035, -0.10001026],
]


def resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of an NHWC (or HWC) image to spatial size ``hw``.

    Equivalent to ``tf.image.resize(x, hw, method='bilinear')`` (the
    reference's resize everywhere, e.g. ``nn/strotss_utils.py:142-143``).
    """
    h, w = int(hw[0]), int(hw[1])
    if x.ndim == 4:
        shape = (x.shape[0], h, w, x.shape[3])
    elif x.ndim == 3:
        shape = (h, w, x.shape[2])
    else:
        raise ValueError(f"Invalid rank: {x.ndim}")
    if shape == x.shape:
        return x
    return jax.image.resize(x, shape, method="bilinear", antialias=False)


def _hw(x: jnp.ndarray) -> Tuple[int, int]:
    if x.ndim == 4:
        return int(x.shape[1]), int(x.shape[2])
    if x.ndim == 3:
        return int(x.shape[0]), int(x.shape[1])
    raise ValueError(f"Invalid rank: {x.ndim}")


def resize_max(x: jnp.ndarray, max_size: Optional[int]) -> jnp.ndarray:
    """Aspect-preserving resize so the longest edge equals ``max_size``.

    Matches the reference's truncating arithmetic exactly
    (``nn/utils.py:32-37``): ``factor = max(h, w) / max_size`` and the new
    shape is ``(int(h/factor), int(w/factor))`` — including the *upscale*
    case when the image is smaller than ``max_size``.
    """
    if max_size is None:
        return x
    h, w = _hw(x)
    factor = max(h / max_size, w / max_size)
    return resize_bilinear(x, (int(h / factor), int(w / factor)))


def cap_max(x: jnp.ndarray, max_size: Optional[int]) -> jnp.ndarray:
    """Downscale so the longest edge is at most ``max_size``; images already
    within the cap pass through untouched.

    Unlike :func:`resize_max` (the reference's *load-time* resize, which also
    upscales smaller images, ``nn/utils.py:32-37``), this is the cap applied
    at the library API boundary (``stylize``/``stylize_batch``), where the
    input may already have been resized at load time. ``resize_max`` is NOT
    idempotent — its truncating arithmetic can map its own output to a
    shape one pixel different (e.g. 310x155 @ 300 → 299x149 → 300x149),
    silently resampling an already-capped image a second time and drifting
    from the reference's single-resize shape; the ``<=`` check here makes
    re-application a guaranteed no-op.
    """
    if max_size is None:
        return x
    h, w = _hw(x)
    if max(h, w) <= max_size:
        return x
    return resize_max(x, max_size)


def resize_like(x: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Resize ``x`` to the spatial dims of ``base`` (``nn/utils.py:40-41``)."""
    return resize_bilinear(x, _hw(base))


def make_laplacian(
    x: jnp.ndarray, return_downscale: bool = False
):
    """One Laplacian band: ``x - up(down(x))`` with /2 bilinear scaling.

    Reference: ``nn/strotss_utils.py:139-146`` (spatial dims floor-divided by
    2 with a floor of 1).
    """
    h, w = _hw(x)
    hd, wd = max(h // 2, 1), max(w // 2, 1)
    down = resize_bilinear(x, (hd, wd))
    band = x - resize_bilinear(down, (h, w))
    if return_downscale:
        return band, down
    return band


def make_laplacian_pyramid(x: jnp.ndarray, levels: int = 5) -> List[jnp.ndarray]:
    """``levels`` band-pass tensors plus the low-res residual (len = levels+1).

    This list *is* the optimization variable set: STROTSS optimizes pyramid
    coefficients, not pixels (reference ``run_strotss.py:89``).
    """
    bands = []
    cur = x
    for _ in range(levels):
        band, cur = make_laplacian(cur, return_downscale=True)
        bands.append(band)
    bands.append(cur)
    return bands


def fold_laplacian_pyramid(bands: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Reconstruct the image from pyramid bands (``nn/strotss_utils.py:159-163``)."""
    out = bands[-1]
    for band in reversed(bands[:-1]):
        out = band + resize_bilinear(out, _hw(band))
    return out


def rgb_to_yuv(x: jnp.ndarray) -> jnp.ndarray:
    """RGB→YUV on the last axis; identical kernel to ``tf.image.rgb_to_yuv``.

    The reference applies this to the first 3 channels of the sampled
    hypercolumn matrix — i.e. the raw image pixels — for the color-palette
    loss (``nn/strotss_utils.py:166-167``, ``run_strotss.py:37-39``).
    """
    k = jnp.asarray(_RGB_TO_YUV, dtype=x.dtype)
    return jnp.matmul(x[..., :3], k, precision="highest")


def postprocess(x: jnp.ndarray) -> jnp.ndarray:
    """Clip to [0,1], global min-max renormalize, uint8, drop batch dim.

    Reference: ``nn/strotss_utils.py:170-175``.
    """
    x = jnp.clip(x, 0.0, 1.0)
    x = x - jnp.min(x)
    x = x / jnp.max(x)
    x = (x * 255.0).astype(jnp.uint8)
    return x[0]


def laplacian_pyramid_shapes(
    hw: Tuple[int, int], levels: int = 5
) -> List[Tuple[int, int]]:
    """Static spatial shapes of each pyramid entry (levels+1 of them)."""
    shapes = []
    h, w = hw
    for _ in range(levels):
        shapes.append((h, w))
        h, w = max(h // 2, 1), max(w // 2, 1)
    shapes.append((h, w))
    return shapes
