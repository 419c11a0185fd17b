"""Checkpoint/resume: an interrupted run resumes bit-exactly."""

import jax.numpy as jnp
import numpy as np

from strotss_tpu.config import StrotssConfig
from strotss_tpu.models.weights import random_params
from strotss_tpu.solve import stylize_single


def _cfg(max_iter, ckpt_dir=None):
    return StrotssConfig(
        levels=2, max_iter=max_iter, log_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
        checkpoint_dir=ckpt_dir,
    )


def test_resume_bit_exact(rng, tmp_path):
    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)

    import pytest

    # uninterrupted run: 2 scales x 4 steps
    img_full, info_full = stylize_single(content, style, _cfg(4), params)

    # interrupted: kill the run after the first chunk (2 of 4 steps of
    # scale 0) via a raising progress callback, then resume
    class Interrupt(Exception):
        pass

    def boom(scl, done, total, metrics):
        raise Interrupt

    d = str(tmp_path / "ckpt")
    with pytest.raises(Interrupt):
        stylize_single(content, style, _cfg(4, d), params, progress_cb=boom)
    img_resumed, info_res = stylize_single(content, style, _cfg(4, d), params)

    np.testing.assert_array_equal(np.asarray(img_full), np.asarray(img_resumed))
    assert info_res["scales"][-1]["loss"] == info_full["scales"][-1]["loss"]


def test_resume_state_shapes_guard(rng, tmp_path):
    import pytest

    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    d = str(tmp_path / "ckpt")
    stylize_single(content, style, _cfg(2, d), params)
    # different pyramid depth => different leaf count => clean error
    bad = StrotssConfig(
        levels=2, max_iter=4, log_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
        checkpoint_dir=d, pyramid_levels=3,
    )
    with pytest.raises(ValueError, match="leaves"):
        stylize_single(content, style, bad, params)