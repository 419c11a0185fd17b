"""Image-op parity vs TF goldens + structural properties."""

import jax.numpy as jnp
import numpy as np

from strotss_tpu.ops import image as I


def test_resize_matches_tf(golden):
    g = golden("resize")
    img = jnp.asarray(g["img"])
    for key in g.files:
        if not key.startswith("r_"):
            continue
        h, w = map(int, key[2:].split("x"))
        out = I.resize_bilinear(img, (h, w))
        np.testing.assert_allclose(np.asarray(out), g[key], atol=2e-6)


def test_resize_max_arithmetic():
    # factor = max(h,w)/max_size with int() truncation (nn/utils.py:32-37)
    img = jnp.zeros((1, 481, 321, 3))
    out = I.resize_max(img, 512)
    assert out.shape == (1, 512, int(321 / (481 / 512)), 3)
    # upscale case
    out = I.resize_max(jnp.zeros((1, 48, 64, 3)), 128)
    assert out.shape == (1, int(48 / 0.5), 128, 3)
    assert I.resize_max(img, None) is img


def test_cap_max_is_idempotent_where_resize_max_is_not():
    """The library-boundary cap must be a no-op on already-capped inputs.

    resize_max's truncating arithmetic is NOT idempotent for non-pow2
    max_size: 31x16 @ 30 -> 29x15, and re-applying resize_max maps 29x15
    -> 30x15 — a second resample that drifts from the reference's
    single load-time resize. cap_max exists so stylize/stylize_batch
    leave loader output untouched."""
    img = jnp.zeros((1, 31, 16, 3), jnp.float32)
    once = I.resize_max(img, 30)
    assert once.shape == (1, 29, 15, 3)
    twice = I.resize_max(once, 30)
    assert twice.shape == (1, 30, 15, 3)  # the double-resample trap
    assert I.cap_max(once, 30) is once  # already capped: untouched
    # oversized input: cap == the reference load-time resize, exactly
    capped = I.cap_max(img, 30)
    assert capped.shape == once.shape
    np.testing.assert_array_equal(np.asarray(capped), np.asarray(once))
    # smaller-than-cap input: caps only, never upscales
    small = jnp.zeros((1, 8, 8, 3), jnp.float32)
    assert I.cap_max(small, 30) is small
    assert I.cap_max(small, None) is small


def test_pyramid_matches_tf(golden):
    g = golden("pyramid")
    im = jnp.asarray(g["im"])
    pyr = I.make_laplacian_pyramid(im, levels=5)
    assert len(pyr) == 6
    for i, p in enumerate(pyr):
        np.testing.assert_allclose(np.asarray(p), g[f"lvl{i}"], atol=3e-6)
    fold = I.fold_laplacian_pyramid(pyr)
    np.testing.assert_allclose(np.asarray(fold), g["fold"], atol=3e-6)


def test_pyramid_roundtrip_identity(rng):
    im = jnp.asarray(rng.random((1, 40, 56, 3)), jnp.float32)
    fold = I.fold_laplacian_pyramid(I.make_laplacian_pyramid(im))
    np.testing.assert_allclose(np.asarray(fold), np.asarray(im), atol=1e-5)


def test_yuv_matches_tf(golden):
    g = golden("yuv")
    out = I.rgb_to_yuv(jnp.asarray(g["feat"][:, :3]))
    np.testing.assert_allclose(np.asarray(out), g["yuv"], atol=1e-6)


def test_postprocess():
    x = jnp.asarray(np.linspace(-0.5, 1.5, 24).reshape(1, 2, 4, 3), jnp.float32)
    out = I.postprocess(x)
    assert out.shape == (2, 4, 3) and out.dtype == jnp.uint8
    assert int(out.min()) == 0 and int(out.max()) == 255


def test_laplacian_shapes():
    shapes = I.laplacian_pyramid_shapes((64, 42), 5)
    assert shapes == [(64, 42), (32, 21), (16, 10), (8, 5), (4, 2), (2, 1)]
