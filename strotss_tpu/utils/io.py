"""Host-side image I/O (PIL + numpy), feeding jnp arrays to the device path.

Parity targets: reference ``load_image``/``write_image``
(``/root/reference/nn/utils.py:44-70``): decode to 3-channel RGB, convert to
float [0,1], optional aspect-preserving max-size resize, optional batch dim;
JPEG written at quality 100; a write asserts batch==1.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from strotss_tpu.ops.image import resize_max
from strotss_tpu.utils.logging import logger


def load_image(
    path: str,
    max_size: Optional[int] = None,
    dtype=jnp.float32,
    batch_expand: bool = True,
) -> jnp.ndarray:
    """Load an image file as (1,H,W,3) float [0,1] (or uint8 when asked).

    The resize happens in float on device via ``resize_bilinear``, matching
    the reference order decode → float convert → resize
    (``nn/utils.py:50-53``).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(f"File not found: {path}")
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"))
    img = jnp.asarray(arr)
    if dtype != jnp.uint8:
        img = img.astype(dtype) / 255.0
        img = resize_max(img, max_size)
    else:
        # uint8 path keeps raw pixel values. NOTE: the resized-uint8
        # branch ROUNDS interpolated values back to integers; mask loading
        # must NOT use it — the reference quantizes the raw float resize
        # output (``ops/masks._load_quantized`` carries those semantics).
        if max_size is not None:
            f = img.astype(jnp.float32)
            f = resize_max(f, max_size)
            img = jnp.clip(jnp.round(f), 0, 255).astype(jnp.uint8)
    if batch_expand:
        img = img[jnp.newaxis]
    return img


def image_size(path: str, max_size: Optional[int] = None):
    """(H, W) that :func:`load_image` would produce — header-only read.

    PIL's ``open`` is lazy (no pixel decode), so this is cheap enough to
    group jobs by shape before loading them (``strotss_tpu.serve``).
    Mirrors ``resize_max``'s truncating arithmetic exactly.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(f"File not found: {path}")
    from PIL import Image

    with Image.open(path) as im:
        w, h = im.size
    if max_size is None:
        return (h, w)
    factor = max(h / max_size, w / max_size)
    return (int(h / factor), int(w / factor))


def write_image(image, path: str) -> None:
    """Write an HWC or 1HWC uint8 (or float [0,1]) image as JPEG/PNG."""
    arr = np.asarray(image)
    if arr.ndim == 4:
        if arr.shape[0] != 1:
            raise ValueError(f"Batch size must be 1. Got {arr.shape[0]}")
        arr = arr[0]
    if arr.ndim != 3:
        raise ValueError(f"Invalid rank: {arr.ndim}")
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    from PIL import Image

    im = Image.fromarray(arr)
    if path.lower().endswith((".jpg", ".jpeg")):
        im.save(path, quality=100)
    else:
        im.save(path)
    logger.info(f"Wrote image to {path}")


def is_jupyter_env() -> bool:
    """True inside Jupyter/Colab — parity with ``nn/utils.py:88-94`` (the
    reference switches to ``tqdm.notebook`` there)."""
    try:
        shell = get_ipython().__class__.__name__  # type: ignore # noqa: F821
        return shell in ("ZMQInteractiveShell", "Shell")
    except NameError:
        return False
