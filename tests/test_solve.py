"""Optimizer parity (Keras RMSprop) + a tiny end-to-end solve."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from strotss_tpu.config import StrotssConfig
from strotss_tpu.models.weights import random_params
from strotss_tpu.solve import make_optimizer, stylize_single


def test_rmsprop_matches_keras_golden(golden):
    g = golden("rmsprop")
    opt = make_optimizer(2e-3)
    var = jnp.asarray(g["init"])
    state = opt.init(var)
    for i, grad in enumerate(g["grads"]):
        updates, state = opt.update(jnp.asarray(grad), state)
        var = optax.apply_updates(var, updates)
        np.testing.assert_allclose(
            np.asarray(var), g["traj"][i], atol=1e-6,
            err_msg=f"diverged from Keras RMSprop at step {i}",
        )


def _tiny_cfg(**kw):
    base = dict(
        levels=1,
        max_iter=4,
        log_every=2,
        sample_size=64,
        compute_dtype="float32",
        use_pallas=False,
        taps=("block1_conv1",),
    )
    base.update(kw)
    return StrotssConfig(**base)


def test_stylize_single_tiny(rng):
    content = jnp.asarray(rng.random((1, 40, 48, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 44, 36, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = _tiny_cfg()
    img, info = stylize_single(content, style, cfg, params)
    # output spatial dims follow resize_max(content, 64)
    assert img.dtype == jnp.uint8 and img.ndim == 3
    assert np.isfinite(info["scales"][0]["loss"])


def test_stylize_single_vgg19(rng):
    """vgg_type='19' runs end-to-end (reference ``nn/model.py:21-25``
    supports both families). With block1-only taps the extractor truncates
    before the architectures diverge, so the compiled program matches the
    VGG16 tests' — cheap on CPU — while the config/params plumbing
    (19-layer param tree, spec.vgg_type) is exercised for real."""
    content = jnp.asarray(rng.random((1, 40, 48, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 44, 36, 3)), jnp.float32)
    params = random_params("19", 0)
    assert len(params) == 16  # VGG19: 2+2+4+4+4 convs
    cfg = _tiny_cfg(vgg_type="19")
    img, info = stylize_single(content, style, cfg, params)
    assert img.dtype == jnp.uint8 and img.ndim == 3
    assert np.isfinite(info["scales"][0]["loss"])


def test_stylize_deterministic(rng):
    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = _tiny_cfg(max_iter=2)
    img1, i1 = stylize_single(content, style, cfg, params)
    img2, i2 = stylize_single(content, style, cfg, params)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    assert i1["scales"][0]["loss"] == i2["scales"][0]["loss"]


def test_stylize_bf16_through_pool(rng):
    # regression: the bf16 conv path must stay differentiable through
    # maxpool and the conv transpose (f32-cotangent/bf16-kernel mix)
    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = _tiny_cfg(
        max_iter=2, compute_dtype="bfloat16",
        taps=("block1_conv1", "block2_conv1"),
    )
    img, info = stylize_single(content, style, cfg, params)
    assert np.isfinite(info["scales"][0]["loss"])


def test_stylize_masked_tiny(rng):
    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    cmask = np.zeros((2, 40, 40, 1), np.float32)
    cmask[0, :20] = 1.0
    cmask[1, 20:] = 1.0
    smask = np.zeros((2, 40, 40, 1), np.float32)
    smask[0, :, :20] = 1.0
    smask[1, :, 20:] = 1.0
    params = random_params("16", 0)
    cfg = _tiny_cfg(max_iter=2, sample_size=32)
    img, info = stylize_single(
        content, style, cfg, params,
        content_masks=jnp.asarray(cmask), style_masks=jnp.asarray(smask),
    )
    assert img.dtype == jnp.uint8
    assert np.isfinite(info["scales"][0]["loss"])


def test_stylize_typed_prng_key(rng):
    """jax.random.key (typed) and jax.random.PRNGKey (raw uint32) give the
    identical run: the typed key is normalized at the API boundary, so the
    AOT-precompiled programs' (2,)-uint32 key signature always matches
    (a typed key used to TypeError at the first program call, after the
    full precompile cost was already paid)."""
    content = jnp.asarray(rng.random((1, 40, 48, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 44, 36, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = _tiny_cfg(max_iter=2)
    img_raw, i_raw = stylize_single(content, style, cfg, params,
                                    key=jax.random.PRNGKey(3))
    img_typed, i_typed = stylize_single(content, style, cfg, params,
                                        key=jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(img_raw), np.asarray(img_typed))
    assert i_raw["scales"][0]["loss"] == i_typed["scales"][0]["loss"]


def test_stylize_max_iter_zero_is_seeded_init(rng):
    """A fresh run with max_iter=0 returns the SEEDED first-scale image
    (content high-freq + style mean), not NaN-postprocessed zero templates
    (the fallback used to hardcode is_first=False)."""
    from strotss_tpu.ops.image import fold_laplacian_pyramid, postprocess
    from strotss_tpu.solve import _scale_seed, resize_max_hw

    content = jnp.asarray(rng.random((1, 40, 48, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 44, 36, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = _tiny_cfg(max_iter=0)
    img, info = stylize_single(content, style, cfg, params)
    a = np.asarray(img)
    assert a.dtype == np.uint8
    assert len(np.unique(a)) > 1, "constant frame: zero templates leaked"
    chw = resize_max_hw(40, 48, cfg.scale_sizes()[0])
    shw = resize_max_hw(44, 36, cfg.scale_sizes()[0])
    _, _, pyr = _scale_seed("first", chw, shw, cfg.pyramid_levels,
                            content, style, content)
    expect = np.asarray(postprocess(fold_laplacian_pyramid(pyr)))
    # one program vs separate eager ops may round the odd pixel apart
    assert np.abs(a.astype(int) - expect.astype(int)).max() <= 1
