"""Mesh sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from strotss_tpu.ops import losses as L
from strotss_tpu.parallel.mesh import make_mesh
from strotss_tpu.parallel.transport import relaxed_emd_sharded


def _cpu_devices(n):
    try:
        cpus = jax.devices("cpu")
    except RuntimeError:
        cpus = [d for d in jax.devices() if d.platform == "cpu"]
    if len(cpus) < n:
        pytest.skip(f"needs {n} virtual CPU devices, have {len(cpus)}")
    return cpus[:n]


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh((8,), ("sample",), devices=_cpu_devices(8))


@pytest.mark.parametrize("dist", ["cosine", "l2", "both"])
def test_sharded_remd_matches(rng, mesh8, dist):
    x = jnp.asarray(rng.standard_normal((96, 12)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((64, 12)), jnp.float32)
    ref = float(L.relaxed_emd(x, y, dist))
    out = float(relaxed_emd_sharded(x, y, mesh8, dist))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_sharded_remd_grad(rng, mesh8):
    x = jnp.asarray(rng.standard_normal((32, 6)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((64, 6)), jnp.float32)
    g_ref = jax.grad(lambda a: L.relaxed_emd(a, y))(x)
    g = jax.grad(lambda a: relaxed_emd_sharded(a, y, mesh8))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_stylize_batch_data_parallel(rng):
    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.parallel.batch import stylize_batch

    mesh = make_mesh((8,), ("data",), devices=_cpu_devices(8))
    contents = jnp.asarray(rng.random((8, 40, 40, 3)), jnp.float32)
    styles = jnp.asarray(rng.random((8, 40, 40, 3)), jnp.float32)
    cfg = StrotssConfig(
        levels=1, max_iter=2, log_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
    )
    params = random_params("16", 0)
    out, info = stylize_batch(contents, styles, cfg, params, mesh=mesh)
    assert out.shape[0] == 8 and out.dtype == jnp.uint8
    assert np.isfinite(info["scales"][0]["loss"])
