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


# --------------------------------------------------------------------------
# streamed Sinkhorn (flash-LSE tiles, no N x M buffer)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("dist", ["cosine", "both"])
def test_sinkhorn_streamed_matches_xla(rng, dist):
    """Forward parity with losses.sinkhorn (VERDICT r1 item 8): same
    Gauss-Seidel iteration, tiles instead of a materialized log_k."""
    from strotss_tpu.ops.kernels.sinkhorn import sinkhorn_streamed

    x = jnp.asarray(rng.standard_normal((96, 24)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((80, 24)), jnp.float32)
    want = float(L.sinkhorn(x, y, dist, lam=10.0, n_iter=20))
    interpret = jax.default_backend() != "tpu"
    got = float(sinkhorn_streamed(x, y, dist, 10.0, 20, interpret))
    # interpret mode: 1e-5 criterion; compiled TPU: the flash accumulation
    # order differs from jax.nn.logsumexp's, drift compounds over iterations
    rtol = 1e-5 if interpret else 1e-4
    np.testing.assert_allclose(got, want, rtol=rtol, atol=1e-6)


def test_sinkhorn_pallas_via_public_api_in_scan(rng):
    """Regression: ``losses.sinkhorn(impl='pallas')`` under value_and_grad
    inside a scan body. ``lam`` used to reach ``sinkhorn_streamed``'s
    nondiff_argnums as a tracer (losses.sinkhorn's jit didn't mark it
    static) → UnexpectedTracerError on every TPU/scan use of the public
    streamed path; the direct-call kernel tests never caught it."""
    x = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)

    def fn(yy):
        return L.sinkhorn(x, yy, "cosine", 10.0, 3, impl="pallas")

    @jax.jit
    def chunk(yy):
        def body(c, _):
            v, g = jax.value_and_grad(fn)(yy + 0.0 * c)
            return c + v, g[0, 0]

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=2)
        return c

    out = float(chunk(y))
    want = 2.0 * float(L.sinkhorn(x, y, "cosine", 10.0, 3, impl="xla"))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-6)


def test_sinkhorn_streamed_grad_matches_frozen_plan(rng):
    """The streamed VJP == jax.grad of the XLA path with stop_gradient on
    the whole transport plan (the documented Danskin estimator: dL/dd = T)."""
    from strotss_tpu.ops.kernels.sinkhorn import sinkhorn_streamed

    x = jnp.asarray(rng.standard_normal((48, 12)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((40, 12)), jnp.float32)
    lam, iters = 10.0, 25

    def xla_frozen(x_, y_):
        # reproduce losses.sinkhorn but freeze the plan in the read-out
        m = L.dist_metrics["cosine"](x_, y_)
        n, mm = m.shape
        log_k = -lam * m
        log_p = jnp.full((n,), -jnp.log(float(n)))
        log_q = jnp.full((mm,), -jnp.log(float(mm)))

        def body(carry, _):
            lu, lv = carry
            lu = log_p - jax.nn.logsumexp(log_k + lv[None, :], axis=1)
            lv = log_q - jax.nn.logsumexp(log_k + lu[:, None], axis=0)
            return (lu, lv), None

        (lu, lv), _ = jax.lax.scan(
            body, (jnp.zeros((n,)), jnp.zeros((mm,))), None, length=iters
        )
        t = jax.lax.stop_gradient(jnp.exp(lu[:, None] + log_k + lv[None, :]))
        return jnp.sum(t * m)

    gx_ref, gy_ref = jax.grad(xla_frozen, argnums=(0, 1))(x, y)
    interpret = jax.default_backend() != "tpu"
    gx, gy = jax.grad(
        lambda a, b: sinkhorn_streamed(a, b, "cosine", lam, iters, interpret),
        argnums=(0, 1),
    )(x, y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref),
                               rtol=1e-4, atol=1e-6)


def test_sinkhorn_streamed_grad_approximates_unrolled(rng):
    """At convergence the envelope gradient is a close descent direction to
    the fully-unrolled gradient (cosine similarity, not exact equality)."""
    from strotss_tpu.ops.kernels.sinkhorn import sinkhorn_streamed

    x = jnp.asarray(rng.standard_normal((48, 12)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((40, 12)), jnp.float32)
    interpret = jax.default_backend() != "tpu"
    g_unrolled = jax.grad(
        lambda a: L.sinkhorn(a, y, "cosine", lam=10.0, n_iter=60)
    )(x)
    g_env = jax.grad(
        lambda a: sinkhorn_streamed(a, y, "cosine", 10.0, 60, interpret)
    )(x)
    gu = np.asarray(g_unrolled).ravel()
    ge = np.asarray(g_env).ravel()
    cos = float(gu @ ge / (np.linalg.norm(gu) * np.linalg.norm(ge)))
    # measured ~0.946 at these sizes; the residual is the entropy-term
    # gradient the unrolled loss carries and the plan gradient does not
    assert cos > 0.9, f"plan grad diverges from unrolled: cos={cos}"


# --- fused block1 ----------------------------------------------------------


def _block1_ref(x, k1, b1, k2, b2):
    """lax-conv reference of VGG block1 (both taps), f32 HIGHEST."""

    def conv(h, k, b):
        y = jax.lax.conv_general_dilated(
            h[None], k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )[0]
        return jnp.maximum(y + b, 0.0)

    t1 = conv(x, k1, b1)
    return t1, conv(t1, k2, b2)


def _block1_weights(rng):
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, 64)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    return k1, b1, k2, b2


@pytest.mark.parametrize("shape,rows", [((13, 11), 4), ((16, 8), 8),
                                        ((7, 21), 4)])
def test_block1_pallas_forward_matches_lax(rng, shape, rows):
    from strotss_tpu.ops.kernels.block1 import block1_pallas

    interpret = jax.default_backend() != "tpu"
    h, w = shape
    x = jnp.asarray(rng.standard_normal((h, w, 3)), jnp.float32)
    k1, b1, k2, b2 = _block1_weights(rng)
    t1r, t2r = _block1_ref(x, k1, b1, k2, b2)
    t1, t2 = block1_pallas(x, k1, b1, k2, b2, rows, jnp.float32, interpret)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t1r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t2r),
                               atol=1e-5, rtol=1e-5)


def test_block1_pallas_grad_matches_lax(rng):
    from strotss_tpu.ops.kernels.block1 import block1_pallas

    interpret = jax.default_backend() != "tpu"
    x = jnp.asarray(rng.standard_normal((13, 11, 3)), jnp.float32)
    k1, b1, k2, b2 = _block1_weights(rng)
    co1 = jnp.asarray(rng.standard_normal((13, 11, 64)), jnp.float32)
    co2 = jnp.asarray(rng.standard_normal((13, 11, 64)), jnp.float32)

    def loss(fn):
        def f(x):
            a, b = fn(x)
            return jnp.sum(a * co1) + jnp.sum(b * co2)
        return f

    g_ref = jax.grad(loss(lambda x: _block1_ref(x, k1, b1, k2, b2)))(x)
    g = jax.grad(loss(lambda x: block1_pallas(
        x, k1, b1, k2, b2, 4, jnp.float32, interpret)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_block1_pallas_weight_grads_are_zero(rng):
    """Frozen-VGG contract: weight/bias cotangents are zeros by design."""
    from strotss_tpu.ops.kernels.block1 import block1_pallas

    interpret = jax.default_backend() != "tpu"
    x = jnp.asarray(rng.standard_normal((9, 10, 3)), jnp.float32)
    k1, b1, k2, b2 = _block1_weights(rng)
    grads = jax.grad(
        lambda k1, b1, k2, b2: jnp.sum(block1_pallas(
            x, k1, b1, k2, b2, 4, jnp.float32, interpret)[1]),
        argnums=(0, 1, 2, 3),
    )(k1, b1, k2, b2)
    for g in grads:
        assert float(jnp.max(jnp.abs(g))) == 0.0


def test_vgg_apply_block1_pallas_matches_xla(rng):
    """The wired policy path: bf16 mixed features with the fused block1
    agree with the lax-conv mixed policy within bf16 tolerance."""
    from strotss_tpu.models.vgg import vgg_apply
    from strotss_tpu.models.weights import random_params

    params = random_params("16")
    x = jnp.asarray(rng.random((1, 14, 12, 3)), jnp.float32)
    taps = ("block1_conv1", "block1_conv2", "block2_conv1")
    ref = vgg_apply(params, x, taps=taps, compute_dtype=jnp.bfloat16,
                    block1_impl="xla")
    got = vgg_apply(params, x, taps=taps, compute_dtype=jnp.bfloat16,
                    block1_impl="pallas", block1_interpret=True)
    assert got[0].dtype == ref[0].dtype
    assert got[2].dtype == ref[2].dtype
    for r, g in zip(ref, got):
        r = np.asarray(r, np.float32)
        g = np.asarray(g, np.float32)
        scale = max(1e-6, np.abs(r).max())
        assert np.abs(r - g).max() / scale < 2e-2
