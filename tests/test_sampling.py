"""Static-shape sampler: distribution, mask, and gather correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from strotss_tpu.ops import sampling as S


def test_coordinate_factors_vgg_chain():
    # VGG hypercolumn at 64x64: image + maps at strides 1,1,2,2,4,4,4,8,16
    shapes = [(64, 64), (64, 64), (64, 64), (32, 32), (32, 32),
              (16, 16), (16, 16), (16, 16), (8, 8), (4, 4)]
    f = S.coordinate_factors(shapes)
    assert f == [1.0, 1.0, 1.0, 0.5, 0.5, 0.25, 0.25, 0.25, 0.125, 0.0625]


def test_coordinate_factors_non_pow2():
    # H=42 not a power of two -> rescale axis switches to W (axis 1)
    shapes = [(42, 64), (21, 32)]
    f = S.coordinate_factors(shapes)
    assert f == [1.0, 0.5]


def test_strided_grid_params():
    # 512x341: area = sqrt((512*341)//16384) = sqrt(10) -> steps (3, 4)
    sx, sy, nx, ny = S.strided_grid_params(512, 341)
    assert (sx, sy) == (3, 4)
    assert nx == -(-512 // 3) and ny == -(-341 // 4)
    # small image -> steps 1
    assert S.strided_grid_params(64, 42)[:2] == (1, 1)


def test_full_grid_unmasked_no_replacement():
    key = jax.random.PRNGKey(0)
    coords = S.full_grid_coords(key, (16, 20), 64)
    assert coords.shape == (64, 2) and coords.dtype == jnp.float32
    c = np.asarray(coords).astype(int)
    assert (c[:, 0] >= 0).all() and (c[:, 0] < 16).all()
    assert (c[:, 1] >= 0).all() and (c[:, 1] < 20).all()
    flat = c[:, 0] * 20 + c[:, 1]
    assert len(np.unique(flat)) == 64  # without replacement


def test_full_grid_masked_inside_region():
    mask = np.zeros((16, 20), np.float32)
    mask[4:12, 5:15] = 1.0  # 80 valid pixels
    coords = S.full_grid_coords(jax.random.PRNGKey(1), (16, 20), 64,
                                jnp.asarray(mask))
    c = np.asarray(coords).astype(int)
    assert mask[c[:, 0], c[:, 1]].all()


def test_full_grid_small_region_replacement():
    mask = np.zeros((16, 20), np.float32)
    mask[0:2, 0:3] = 1.0  # 6 valid pixels < 64 samples
    coords = S.full_grid_coords(jax.random.PRNGKey(2), (16, 20), 64,
                                jnp.asarray(mask))
    c = np.asarray(coords).astype(int)
    assert c.shape == (64, 2)
    assert mask[c[:, 0], c[:, 1]].all()  # all inside, with replacement


def test_strided_grid_coords_on_grid():
    h, w = 256, 384  # area=sqrt(6) -> steps (2,3)
    sx, sy, _, _ = S.strided_grid_params(h, w)
    coords = S.strided_grid_coords(jax.random.PRNGKey(3), (h, w), 128)
    c = np.asarray(coords).astype(int)
    assert c.shape == (128, 2)
    assert (c[:, 0] % sx == c[0, 0] % sx).all()  # shared x offset
    assert (c[:, 1] % sy == c[0, 1] % sy).all()
    assert (c[:, 0] < h).all() and (c[:, 1] < w).all()


def test_bilinear_gather_exact_at_integers(rng):
    fmap = jnp.asarray(rng.random((7, 9, 4)), jnp.float32)
    coords = jnp.asarray([[2.0, 3.0], [0.0, 0.0], [6.0, 8.0]])
    out = np.asarray(S.bilinear_gather(fmap, coords))
    f = np.asarray(fmap)
    np.testing.assert_allclose(out[0], f[2, 3], atol=1e-6)
    np.testing.assert_allclose(out[1], f[0, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], f[6, 8], atol=1e-6)


def test_bilinear_gather_midpoint(rng):
    fmap = jnp.asarray(rng.random((5, 5, 2)), jnp.float32)
    out = np.asarray(S.bilinear_gather(fmap, jnp.asarray([[1.5, 2.5]])))
    f = np.asarray(fmap)
    expect = 0.25 * (f[1, 2] + f[1, 3] + f[2, 2] + f[2, 3])
    np.testing.assert_allclose(out[0], expect, atol=1e-6)


def test_nearest_gather_truncates(rng):
    fmap = jnp.asarray(rng.random((5, 6, 3)), jnp.float32)
    out = np.asarray(S.nearest_gather(fmap, jnp.asarray([[1.9, 2.7], [9.0, -1.0]])))
    f = np.asarray(fmap)
    np.testing.assert_allclose(out[0], f[1, 2], atol=1e-6)  # trunc, not round
    np.testing.assert_allclose(out[1], f[4, 0], atol=1e-6)  # clipped


def test_sample_hypercolumn_shapes(rng):
    feats = [
        jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32),
        jnp.asarray(rng.random((1, 16, 16, 5)), jnp.float32),
        jnp.asarray(rng.random((1, 8, 8, 7)), jnp.float32),
    ]
    coords = S.full_grid_coords(jax.random.PRNGKey(0), (16, 16), 32)
    out = S.sample_hypercolumn(feats, coords, bilinear=True)
    assert out.shape == (32, 15) and out.dtype == jnp.float32


def test_sample_paired_shared_coords(rng):
    xs = [jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)]
    key = jax.random.PRNGKey(5)
    a, b = S.sample_paired(key, xs, xs, 32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sampling_class_api(rng):
    # reference-parity class surface: Sampling(n)(xs) / .bilinear(xs, ys)
    feats = [jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)]
    s = S.Sampling(24, seed=0)
    t = s(feats)
    assert t.shape == (24, 3)
    a, b = s.bilinear(feats, feats)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # stateful: consecutive calls draw different samples
    t2 = s(feats)
    assert not np.array_equal(np.asarray(t), np.asarray(t2))


def test_prepare_mask_allpass():
    from strotss_tpu.ops.sampling import prepare_mask

    m = jnp.zeros((20, 20, 1), jnp.float32)  # empty mask -> all-pass rule
    out = np.asarray(prepare_mask(m, (10, 10)))
    assert (out == 1.0).all()
    m2 = jnp.zeros((20, 20, 1), jnp.float32).at[:10].set(1.0)
    out2 = np.asarray(prepare_mask(m2, (10, 10)))
    assert out2[:4].all() and not out2[6:].any()


def test_matmul_hypercolumn_matches_gather(rng):
    # the one-hot-matmul formulation is numerically identical to the
    # fused 4-corner gather (f32 maps, HIGHEST matmul), incl. shared
    # weight matrices across same-resolution maps and clipped borders
    feats = [jnp.asarray(rng.standard_normal((13, 11, 3)), jnp.float32),
             jnp.asarray(rng.standard_normal((13, 11, 5)), jnp.float32),
             jnp.asarray(rng.standard_normal((7, 6, 4)), jnp.float32),
             jnp.asarray(rng.standard_normal((4, 3, 2)), jnp.float32)]
    coords = jnp.concatenate([
        S.strided_grid_coords(jax.random.PRNGKey(3), (13, 11), 32),
        jnp.asarray([[0.0, 0.0], [12.0, 10.0], [12.9, 10.9], [-0.5, 3.2]],
                    jnp.float32),
    ])
    a = S.sample_hypercolumn(feats, coords, bilinear=True)
    b = S.sample_hypercolumn_matmul(feats, coords)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)

    def loss(fn):
        return lambda p: jnp.sum(
            fn([feats[0], p] + feats[2:], coords) ** 2)

    ga = jax.grad(loss(lambda fs, c: S.sample_hypercolumn(
        fs, c, bilinear=True)))(feats[1])
    gb = jax.grad(loss(S.sample_hypercolumn_matmul))(feats[1])
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               atol=1e-6, rtol=1e-6)


def test_integer_coords_paths_bit_identical(rng):
    # grid coords are exact integers at base resolution; the degenerate
    # single-corner gather / one-pass weight matrix must be BIT-identical
    # to the full 4-corner bilinear formulations
    feats = [jnp.asarray(rng.standard_normal((12, 10, 3)), jnp.float32),
             jnp.asarray(rng.standard_normal((12, 10, 5)), jnp.float32),
             jnp.asarray(rng.standard_normal((6, 5, 4)), jnp.float32)]
    coords = S.strided_grid_coords(jax.random.PRNGKey(5), (12, 10), 24)
    for px in (0, 2 ** 62):  # gather regime and matmul regime
        a = S.sample_hypercolumn(feats, coords, bilinear=True,
                                 matmul_px=px, integer_coords=False)
        b = S.sample_hypercolumn(feats, coords, bilinear=True,
                                 matmul_px=px, integer_coords=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # weight matrix itself: one-pass == four-pass on integer coords
    wa = S.bilinear_weight_matrix((12, 10), coords)
    wb = S.bilinear_weight_matrix((12, 10), coords, integer_coords=True)
    np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))


def test_empty_region_falls_back_to_grid():
    """A region with ZERO valid pixels (possible even past prepare_mask's
    max<0.1 allpass hatch, e.g. resized max 0.3 with nothing over the 0.5
    threshold) must not collapse every sample onto index 0 — both samplers
    fall back to the unmasked grid for that draw."""
    key = jax.random.PRNGKey(3)
    mask = jnp.zeros((16, 16), jnp.float32)

    full = np.asarray(S.full_grid_coords(key, (16, 16), 64, mask=mask))
    strided = np.asarray(S.strided_grid_coords(key, (16, 16), 64, mask=mask))
    for coords in (full, strided):
        assert coords.min() >= 0 and coords.max() < 16
        assert len(np.unique(coords, axis=0)) > 1, (
            "all samples collapsed onto one point"
        )
    # the fallback draw matches the unmasked sampler exactly (same key):
    # an empty region degenerates to 'sample anywhere', not to new logic
    np.testing.assert_array_equal(
        full, np.asarray(S.full_grid_coords(key, (16, 16), 64))
    )


def test_nonempty_region_sampling_unchanged_by_fallback():
    """The fallback is a strict no-op whenever >=1 valid pixel exists —
    masked-run trajectories and parity fixtures are untouched."""
    key = jax.random.PRNGKey(5)
    mask = jnp.zeros((16, 16), jnp.float32).at[4:8, 4:8].set(1.0)
    coords = np.asarray(S.full_grid_coords(key, (16, 16), 32, mask=mask))
    assert (coords >= 4).all() and (coords < 8).all()


def test_wrong_resolution_mask_rejected():
    """A prepared 2-D mask at the wrong resolution must fail fast — it
    would otherwise silently draw coordinates from the wrong index
    domain (shapes are static, so the check is trace-time free)."""
    import pytest

    key = jax.random.PRNGKey(0)
    bad = jnp.ones((8, 8), jnp.float32)
    with pytest.raises(ValueError, match="base grid"):
        S.full_grid_coords(key, (16, 12), 32, mask=bad)
    with pytest.raises(ValueError, match="base grid"):
        S.strided_grid_coords(key, (16, 12), 32, mask=bad)


def test_unlisted_precision_gates_to_gathers():
    """Precisions without a measured matmul crossover (the loss ladder's
    experimental 'default') must gate to the plain-gather path instead of
    KeyError-ing — and match the gather regime bit-for-bit."""
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)]
    coords = S.full_grid_coords(jax.random.PRNGKey(0), (8, 8), 16)
    got = S.sample_hypercolumn(feats, coords, bilinear=True,
                               matmul_prec="default")
    want = S.sample_hypercolumn(feats, coords, bilinear=True, matmul_px=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
