"""API-boundary input validation (VERDICT r2 item 8).

Mis-shaped inputs must fail with clear errors at the ``stylize`` /
``stylize_batch`` boundary, not deep inside a jit trace. Reference
analogue: the rank checks in ``/root/reference/nn/utils.py:22-30``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from strotss_tpu.api import stylize
from strotss_tpu.parallel.batch import stylize_batch
from strotss_tpu.validation import check_image, check_masks


def _img(*shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def test_stylize_rejects_hwc():
    with pytest.raises(ValueError, match=r"content\[None\]"):
        stylize(_img(40, 40, 3), _img(1, 40, 40, 3))


def test_stylize_rejects_wrong_channels():
    with pytest.raises(ValueError, match="style must have shape"):
        stylize(_img(1, 40, 40, 3), _img(1, 40, 40, 4))


def test_stylize_rejects_batch_gt_one():
    with pytest.raises(ValueError, match="stylize_batch"):
        stylize(_img(2, 40, 40, 3), _img(1, 40, 40, 3))


def test_stylize_rejects_integer_dtype():
    with pytest.raises(ValueError, match="floating point"):
        stylize(_img(1, 40, 40, 3, dtype=jnp.uint8), _img(1, 40, 40, 3))


def test_stylize_rejects_lone_mask():
    with pytest.raises(ValueError, match="given together"):
        stylize(
            _img(1, 40, 40, 3), _img(1, 40, 40, 3),
            content_masks=_img(2, 40, 40, 1),
        )


def test_stylize_rejects_region_count_mismatch():
    with pytest.raises(ValueError, match="region-for-region"):
        stylize(
            _img(1, 40, 40, 3), _img(1, 40, 40, 3),
            content_masks=_img(2, 40, 40, 1), style_masks=_img(3, 40, 40, 1),
        )


def test_stylize_batch_rejects_batch_mismatch():
    with pytest.raises(ValueError, match="same batch dim"):
        stylize_batch(_img(2, 40, 40, 3), _img(3, 40, 40, 3))


def test_stylize_batch_rejects_unbatched_mask():
    with pytest.raises(ValueError, match=r"\(B, K, H, W, 1\)"):
        stylize_batch(
            _img(2, 40, 40, 3), _img(2, 40, 40, 3),
            content_masks=_img(2, 40, 40, 1), style_masks=_img(2, 40, 40, 1),
        )


def test_stylize_batch_rejects_bad_region_valid():
    with pytest.raises(ValueError, match=r"region_valid must have shape"):
        stylize_batch(
            _img(2, 40, 40, 3), _img(2, 40, 40, 3),
            content_masks=_img(2, 3, 40, 40, 1),
            style_masks=_img(2, 3, 40, 40, 1),
            region_valid=jnp.ones((2, 2), jnp.float32),
        )


def test_check_image_accepts_numpy():
    check_image("content", np.zeros((1, 8, 8, 3), np.float64))
    check_masks(
        np.zeros((2, 8, 8, 1), np.float32), np.zeros((2, 8, 8, 1), np.float32)
    )


def test_shard_samples_requires_sample_axis():
    """An explicit scaling request must not silently no-op (mesh=None) or
    die deep inside the trace (mesh without the axis) — same upfront
    contract as shard_spatial."""
    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.solve import stylize_single

    cfg = StrotssConfig(
        levels=1, max_iter=1, log_every=1, sample_size=16,
        compute_dtype="float32", use_pallas=False,
        taps=("block1_conv1",), shard_samples=True,
    )
    params = random_params("16", 0)
    with pytest.raises(ValueError, match="'sample' axis"):
        stylize_single(_img(1, 32, 32, 3), _img(1, 32, 32, 3), cfg, params)
    with pytest.raises(ValueError, match="'sample' axis"):
        stylize_batch(_img(2, 32, 32, 3), _img(2, 32, 32, 3), cfg)


def test_region_valid_without_masks_rejected():
    """region_valid weights mask REGIONS; without region stacks it would
    be silently dropped by the unmasked loss path."""
    with pytest.raises(ValueError, match="region_valid"):
        check_masks(None, None,
                    region_valid=np.ones((2, 3), np.float32),
                    batched=True, batch=2)


def test_init_image_validated_at_api_boundary():
    """A mis-shaped warm-start image fails fast with the layout spelled
    out, before any weight loading or trace."""
    with pytest.raises(ValueError, match="init_image.*pass init_image"):
        stylize(_img(1, 40, 40, 3), _img(1, 40, 40, 3),
                init_image=_img(40, 40, 3))
    with pytest.raises(ValueError, match="init_image"):
        stylize(_img(1, 40, 40, 3), _img(1, 40, 40, 3),
                init_image=_img(1, 40, 40, 3, dtype=jnp.uint8))
