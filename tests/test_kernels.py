"""Pallas REMD kernel vs the XLA reference implementation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from strotss_tpu.ops import losses as L
from strotss_tpu.ops.kernels.remd import relaxed_emd_pallas, remd_mins


@pytest.mark.parametrize("dist", ["cosine", "l2", "both"])
@pytest.mark.parametrize("shape", [(100, 130, 35), (257, 80, 3)])
def test_remd_forward_matches_xla(rng, dist, shape):
    n, m, c = shape
    x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)
    ref = float(L.relaxed_emd(x, y, dist, impl="xla"))
    out = float(relaxed_emd_pallas(x, y, dist))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


@pytest.mark.parametrize("dist", ["cosine", "l2", "both"])
def test_remd_mins_match(rng, dist):
    x = jnp.asarray(rng.standard_normal((70, 11)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((90, 11)), jnp.float32)
    c = np.asarray(L.dist_metrics[dist](x, y))
    rowmin, colmin = remd_mins(x, y, dist, True)
    np.testing.assert_allclose(np.asarray(rowmin), c.min(axis=1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(colmin), c.min(axis=0), atol=1e-5)


@pytest.mark.parametrize("dist", ["cosine", "l2", "both"])
def test_remd_grad_matches_xla(rng, dist):
    x = jnp.asarray(rng.standard_normal((48, 13)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((56, 13)), jnp.float32)

    gx_ref, gy_ref = jax.grad(
        lambda a, b: L.relaxed_emd(a, b, dist, impl="xla"), argnums=(0, 1)
    )(x, y)
    gx, gy = jax.grad(
        lambda a, b: relaxed_emd_pallas(a, b, dist), argnums=(0, 1)
    )(x, y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref),
                               atol=1e-5, rtol=1e-4)


def test_selfsim_pallas_forward(rng):
    from strotss_tpu.ops.kernels.selfsim import self_similarity_pallas

    interpret = jax.default_backend() != "tpu"
    for n, c in [(96, 20), (130, 35)]:
        x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
        ref = float(L.self_similarity(x, y, impl="xla"))
        out = float(self_similarity_pallas(x, y, interpret))
        np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_selfsim_pallas_grad(rng):
    from strotss_tpu.ops.kernels.selfsim import self_similarity_pallas

    interpret = jax.default_backend() != "tpu"
    x = jnp.asarray(rng.standard_normal((96, 20)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((96, 20)), jnp.float32)
    gx_r, gy_r = jax.grad(
        lambda a, b: L.self_similarity(a, b, impl="xla"), argnums=(0, 1)
    )(x, y)
    gx, gy = jax.grad(
        lambda a, b: self_similarity_pallas(a, b, interpret), argnums=(0, 1)
    )(x, y)
    scale = float(jnp.abs(gx_r).max())
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               atol=1e-6 * max(scale * 1e3, 1.0))
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_r),
                               atol=1e-6 * max(scale * 1e3, 1.0))


def test_remd_grad_style_like(rng):
    # asymmetric alpha-weighted combination, like the style loss uses it
    x = jnp.asarray(rng.standard_normal((40, 9)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((40, 9)), jnp.float32)

    def f_pallas(p):
        return relaxed_emd_pallas(x, p, "cosine") + 0.5 * relaxed_emd_pallas(
            x[:, :3], p[:, :3], "both"
        )

    def f_xla(p):
        return L.relaxed_emd(x, p, "cosine") + 0.5 * L.relaxed_emd(
            x[:, :3], p[:, :3], "both"
        )

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_pallas)(y)),
        np.asarray(jax.grad(f_xla)(y)),
        atol=1e-5,
        rtol=1e-4,
    )
