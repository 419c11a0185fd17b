"""Loss parity vs the TF reference (golden npz) + closed-form cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from strotss_tpu.ops import losses as L


def test_cosine_distance_golden(golden):
    g = golden("losses")
    out = L.cosine_distance(jnp.asarray(g["x"]), jnp.asarray(g["y"]))
    np.testing.assert_allclose(np.asarray(out), g["cosine"], atol=1e-5)


def test_l2_distance_golden(golden):
    g = golden("losses")
    out = L.l2_distance(jnp.asarray(g["x"]), jnp.asarray(g["y"]))
    np.testing.assert_allclose(np.asarray(out), g["l2"], atol=1e-5)


@pytest.mark.parametrize("dist", ["cosine", "l2", "both"])
def test_remd_golden(golden, dist):
    g = golden("losses")
    out = L.relaxed_emd(jnp.asarray(g["x"]), jnp.asarray(g["y"]), dist)
    np.testing.assert_allclose(float(out), float(g[f"remd_{dist}"]), rtol=1e-5)


def test_selfsim_golden(golden):
    g = golden("losses")
    out = L.self_similarity(jnp.asarray(g["x"]), jnp.asarray(g["z"]))
    np.testing.assert_allclose(float(out), float(g["selfsim"]), rtol=1e-4)


def test_moments_golden(golden):
    g = golden("losses")
    out = L.moment_matching(jnp.asarray(g["x"]), jnp.asarray(g["y"]))
    np.testing.assert_allclose(float(out), float(g["moments"]), rtol=1e-4)


def test_moment_hoisting_identical(rng):
    """Precomputed target moments (hoisted out of the step scan by the
    solver) are bit-identical to recomputing inside moment_matching."""
    x = jnp.asarray(rng.standard_normal((64, 17)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((64, 17)), jnp.float32)
    ref = L.moment_matching(x, y)
    hoisted = L.moment_matching_from_stats(L.moment_stats(x), y)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(hoisted))
    # and through style_loss's target_moments path
    a = L.style_loss(x, y, 2.0)
    b = L.style_loss(x, y, 2.0, target_moments=L.moment_stats(x))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cosine_orthonormal_rows():
    x = jnp.eye(4, 8)
    d = L.cosine_distance(x, x)
    np.testing.assert_allclose(np.asarray(d), 1.0 - np.eye(4), atol=1e-6)


def test_remd_identical_sets_is_zero(rng):
    x = jnp.asarray(rng.standard_normal((32, 9)), jnp.float32)
    assert float(L.relaxed_emd(x, x, "cosine")) < 1e-6


def test_selfsim_identical_is_zero(rng):
    x = jnp.asarray(rng.standard_normal((32, 9)), jnp.float32)
    assert float(L.self_similarity(x, x)) < 1e-6


def test_remd_one_sided_max():
    # x has a far outlier: row-min mean must dominate
    x = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [-5.0, -5.0]])
    y = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    c = np.asarray(L.cosine_distance(x, y))
    expect = max(c.min(axis=1).mean(), c.min(axis=0).mean())
    np.testing.assert_allclose(float(L.relaxed_emd(x, y)), expect, rtol=1e-6)


def test_sinkhorn_matches_assignment(rng):
    # for N==M, uniform marginals, and low entropy, Sinkhorn cost approaches
    # the optimal assignment cost / N
    from scipy.optimize import linear_sum_assignment

    x = jnp.asarray(rng.standard_normal((16, 6)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((16, 6)), jnp.float32)
    c = np.asarray(L.cosine_distance(x, y))
    ri, ci = linear_sum_assignment(c)
    exact = c[ri, ci].mean()
    approx = float(L.sinkhorn(x, y, "cosine", lam=150.0, n_iter=200))
    assert abs(approx - exact) < 0.05 * max(abs(exact), 0.1)


def test_sinkhorn_identical_near_zero(rng):
    x = jnp.asarray(rng.standard_normal((24, 5)), jnp.float32)
    assert float(L.sinkhorn(x, x, "cosine", lam=200.0, n_iter=150)) < 0.01


def test_style_loss_composition(golden):
    g = golden("losses")
    x = jnp.asarray(g["x"][:, :7])
    y = jnp.asarray(g["z"][:, :7])
    alpha = 16.0
    manual = (
        L.moment_matching(x, y)
        + L.relaxed_emd(x, y, "cosine")
        + (1.0 / alpha)
        * L.relaxed_emd(
            L.rgb_to_yuv(x), L.rgb_to_yuv(y), "both"
        )
    )
    out = L.style_loss(x, y, alpha)
    np.testing.assert_allclose(float(out), float(manual), rtol=1e-6)


def test_losses_grad_finite(rng):
    x = jnp.asarray(rng.standard_normal((20, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((24, 8)), jnp.float32)

    def f(p):
        return L.relaxed_emd(p, y) + L.self_similarity(p, x) + L.moment_matching(x, p)

    g = jax.grad(f)(x + 0.1)
    assert np.all(np.isfinite(np.asarray(g)))
