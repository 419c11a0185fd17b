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


@pytest.mark.slow
def test_stylize_batch_masked(rng, tmp_path):
    """masked x batched composition (VERDICT r1 item 4): (B, K, H, W, 1)
    padded region stacks + validity weights + checkpoint/resume."""
    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.parallel.batch import stylize_batch

    mesh = make_mesh((4,), ("data",), devices=_cpu_devices(4))
    B, K = 4, 2
    contents = jnp.asarray(rng.random((B, 40, 40, 3)), jnp.float32)
    styles = jnp.asarray(rng.random((B, 40, 40, 3)), jnp.float32)
    cm = np.zeros((B, K, 40, 40, 1), np.float32)
    sm = np.zeros((B, K, 40, 40, 1), np.float32)
    cm[:, 0, :, :20], cm[:, 1, :, 20:] = 1.0, 1.0
    sm[:, 0, :20, :], sm[:, 1, 20:, :] = 1.0, 1.0
    # pair 0 has only one real region: mark region 1 invalid
    valid = np.ones((B, K), np.float32)
    valid[0, 1] = 0.0
    cfg = StrotssConfig(
        levels=1, max_iter=2, log_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    params = random_params("16", 0)
    out, info = stylize_batch(
        contents, styles, cfg, params, mesh=mesh,
        content_masks=jnp.asarray(cm), style_masks=jnp.asarray(sm),
        region_valid=jnp.asarray(valid),
    )
    # levels=1 -> the 64px scale; inputs upscale like the reference's resize
    assert out.shape == (B, 64, 64, 3) and out.dtype == jnp.uint8
    assert np.isfinite(info["scales"][0]["loss"])
    assert info["scales"][0]["curve"].shape == (2, B, 3)
    # resume from the checkpoint written at the chunk boundary: bit-exact
    out2, info2 = stylize_batch(
        contents, styles, cfg, params, mesh=mesh,
        content_masks=jnp.asarray(cm), style_masks=jnp.asarray(sm),
        region_valid=jnp.asarray(valid),
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


@pytest.mark.slow
def test_batched_matches_single_runs(rng):
    """Per-pair exactness (VERDICT r2 item 2): a B=2 batched run's per-pair
    loss curves match two ``stylize_single`` runs with injected per-pair
    keys to float tolerance — the batched loss is the per-pair SUM and
    every pair carries its own key stream, so RMSprop dynamics are
    per-pair exact (reference semantics: B independent ``run()`` calls,
    ``run_strotss.py:43-161``)."""
    import jax

    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.parallel.batch import stylize_batch
    from strotss_tpu.solve import stylize_single

    contents = jnp.asarray(rng.random((2, 40, 40, 3)), jnp.float32)
    styles = jnp.asarray(rng.random((2, 40, 40, 3)), jnp.float32)
    # levels=2 covers the scale handoff (prev upsample + alpha halving)
    cfg = StrotssConfig(
        levels=2, max_iter=3, log_every=3, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
        precompile=False,
    )
    params = random_params("16", 0)
    key = jax.random.PRNGKey(7)

    out_b, info_b = stylize_batch(contents, styles, cfg, params, key=key)
    for b in range(2):
        out_s, info_s = stylize_single(
            contents[b:b + 1], styles[b:b + 1], cfg, params,
            key=jax.random.fold_in(key, b),
        )
        for sc in range(2):
            np.testing.assert_allclose(
                info_b["scales"][sc]["curve"][:, b, :],
                info_s["scales"][sc]["curve"],
                rtol=2e-4, atol=1e-6,
                err_msg=f"pair {b} scale {sc} trajectory diverged",
            )
        # postprocess min-max renormalizes; allow 1 ulp of uint8 rounding
        diff = np.abs(
            np.asarray(out_b[b], np.int16) - np.asarray(out_s, np.int16)
        )
        assert diff.max() <= 1, f"pair {b} image diverged (max {diff.max()})"


@pytest.mark.slow
def test_batched_per_pair_alpha_and_keys_match_singles(rng):
    """Round 4: per-pair ``alphas`` and ``pair_keys`` ride the pair axis —
    pair b's trajectory equals a ``stylize_single`` run with
    ``cfg.alpha=alphas[b]`` and ``key=pair_keys[b]`` (so serve can batch
    heterogeneous alpha/seed jobs, and a job's result is independent of
    how the scheduler grouped it). levels=2 covers the per-scale alpha
    halving of the per-pair vector."""
    import dataclasses

    import jax

    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.parallel.batch import stylize_batch
    from strotss_tpu.solve import stylize_single

    contents = jnp.asarray(rng.random((2, 40, 40, 3)), jnp.float32)
    styles = jnp.asarray(rng.random((2, 40, 40, 3)), jnp.float32)
    cfg = StrotssConfig(
        levels=2, max_iter=3, log_every=3, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
        precompile=False,
    )
    params = random_params("16", 0)
    alphas = [1.0, 4.0]
    keys = [jax.random.PRNGKey(3), jax.random.PRNGKey(11)]

    out_b, info_b = stylize_batch(
        contents, styles, cfg, params,
        alphas=alphas, pair_keys=keys,
    )
    # heterogeneous alphas surface per-pair in the info
    assert info_b["scales"][0]["alpha"] == [16.0, 64.0]
    for b in range(2):
        out_s, info_s = stylize_single(
            contents[b:b + 1], styles[b:b + 1],
            dataclasses.replace(cfg, alpha=alphas[b]), params,
            key=keys[b],
        )
        for sc in range(2):
            np.testing.assert_allclose(
                info_b["scales"][sc]["curve"][:, b, :],
                info_s["scales"][sc]["curve"],
                rtol=2e-4, atol=1e-6,
                err_msg=f"pair {b} scale {sc} trajectory diverged",
            )
        diff = np.abs(
            np.asarray(out_b[b], np.int16) - np.asarray(out_s, np.int16)
        )
        assert diff.max() <= 1, f"pair {b} image diverged (max {diff.max()})"


def test_pair_keys_single_key_rejected(rng):
    """Passing ONE raw (2,)-uint32 key where a list of per-pair keys
    belongs must fail loudly at the API boundary — at B=2 the stacked
    shape (2,) used to pass a batch-dim-only check and surface as an
    opaque trace-time shape error inside fold_in."""
    import jax

    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.parallel.batch import stylize_batch

    contents = jnp.asarray(rng.random((2, 40, 40, 3)), jnp.float32)
    styles = jnp.asarray(rng.random((2, 40, 40, 3)), jnp.float32)
    cfg = StrotssConfig(
        levels=1, max_iter=2, log_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
        precompile=False,
    )
    params = random_params("16", 0)
    with pytest.raises(ValueError, match="one key per pair"):
        stylize_batch(contents, styles, cfg, params,
                      pair_keys=jax.random.PRNGKey(7))


@pytest.mark.slow
def test_batched_resume_with_different_pair_keys_refused(rng, tmp_path):
    """Explicit per-pair keys are part of the checkpoint fingerprint:
    resuming a batched run under different pair_keys must be an error,
    not a silent trajectory divergence (every later scale derives its
    k_style/k_run from them — same contract as cfg.seed and alphas)."""
    import jax

    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.parallel.batch import stylize_batch

    contents = jnp.asarray(rng.random((2, 40, 40, 3)), jnp.float32)
    styles = jnp.asarray(rng.random((2, 40, 40, 3)), jnp.float32)
    cfg = StrotssConfig(
        levels=1, max_iter=2, log_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
        precompile=False, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    params = random_params("16", 0)
    keys = [jax.random.PRNGKey(3), jax.random.PRNGKey(11)]
    stylize_batch(contents, styles, cfg, params, pair_keys=keys)
    with pytest.raises(ValueError, match="pair_keys"):
        stylize_batch(
            contents, styles, cfg, params,
            pair_keys=[jax.random.PRNGKey(11), jax.random.PRNGKey(3)],
        )
    # the original keys still resume cleanly (bit-exact replay)
    out2, _ = stylize_batch(contents, styles, cfg, params, pair_keys=keys)
    assert out2.shape[0] == 2


@pytest.mark.slow
def test_shard_samples_matches_unsharded(rng):
    """cfg.shard_samples partitions the transport losses over the mesh's
    'sample' axis (VERDICT r1 item 5); losses must match the single-device
    run to float tolerance."""
    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.solve import stylize_single

    mesh = make_mesh((1, 8), ("data", "sample"), devices=_cpu_devices(8))
    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)

    def cfg(shard):
        return StrotssConfig(
            levels=1, max_iter=3, log_every=3, sample_size=32,
            compute_dtype="float32", use_pallas=False,
            taps=("block1_conv1",), shard_samples=shard,
        )

    img_ref, info_ref = stylize_single(content, style, cfg(False), params)
    img_sh, info_sh = stylize_single(
        content, style, cfg(True), params, mesh=mesh
    )
    np.testing.assert_allclose(
        info_sh["scales"][0]["curve"], info_ref["scales"][0]["curve"],
        rtol=2e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_shard_spatial_matches_unsharded(rng):
    """cfg.shard_spatial spatially partitions the conv stack (fwd+bwd) of a
    SINGLE stylization over the mesh's 'spatial' axis via GSPMD halo
    exchanges; the loss trajectory must match the single-device run to
    float tolerance (partitioned convs only reorder accumulations)."""
    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.solve import stylize_single

    cpus = _cpu_devices(8)
    mesh = make_mesh((8,), ("spatial",), devices=cpus)
    # pin BOTH runs to CPU (committed inputs): the only delta is then the
    # spatial partitioning, not the backend
    content = jax.device_put(
        jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32), cpus[0]
    )
    style = jax.device_put(
        jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32), cpus[0]
    )
    params = jax.device_put(random_params("16", 0), cpus[0])

    def cfg(shard):
        return StrotssConfig(
            levels=1, max_iter=3, log_every=3, sample_size=32,
            compute_dtype="float32", use_pallas=False, precompile=False,
            taps=("block1_conv1",), shard_spatial=shard,
        )

    img_ref, info_ref = stylize_single(content, style, cfg(False), params)
    img_sh, info_sh = stylize_single(
        content, style, cfg(True), params, mesh=mesh
    )
    np.testing.assert_allclose(
        info_sh["scales"][0]["curve"], info_ref["scales"][0]["curve"],
        rtol=2e-4, atol=1e-5,
    )
    # the rendered images must agree to 1 uint8 ulp
    diff = np.abs(
        np.asarray(img_sh).astype(int) - np.asarray(img_ref).astype(int)
    )
    assert diff.max() <= 1, f"image diverged (max {diff.max()})"


@pytest.mark.slow
def test_shard_spatial_composes_with_masks(rng):
    """Masked (region-vmapped) runs compose with spatial sharding: the
    region vmap rides inside the GSPMD-partitioned program."""
    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.solve import stylize_single

    cpus = _cpu_devices(8)
    mesh = make_mesh((8,), ("spatial",), devices=cpus)
    content = jax.device_put(
        jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32), cpus[0]
    )
    style = jax.device_put(
        jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32), cpus[0]
    )
    cm = np.zeros((2, 40, 40, 1), np.float32)
    sm = np.zeros((2, 40, 40, 1), np.float32)
    cm[0, :, :20], cm[1, :, 20:] = 1.0, 1.0
    sm[0, :20, :], sm[1, 20:, :] = 1.0, 1.0
    cm = jax.device_put(jnp.asarray(cm), cpus[0])
    sm = jax.device_put(jnp.asarray(sm), cpus[0])
    params = jax.device_put(random_params("16", 0), cpus[0])

    def cfg(shard):
        return StrotssConfig(
            levels=1, max_iter=2, log_every=2, sample_size=32,
            compute_dtype="float32", use_pallas=False, precompile=False,
            taps=("block1_conv1",), shard_spatial=shard,
        )

    _, info_ref = stylize_single(content, style, cfg(False), params,
                                 content_masks=cm, style_masks=sm)
    _, info_sh = stylize_single(content, style, cfg(True), params,
                                content_masks=cm, style_masks=sm,
                                mesh=mesh)
    np.testing.assert_allclose(
        info_sh["scales"][0]["curve"], info_ref["scales"][0]["curve"],
        rtol=2e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_shard_spatial_composes_with_shard_samples(rng):
    """The 2-D ('spatial','sample') mesh claim in docs/ARCHITECTURE.md:
    conv-stack height partitioning and transport-loss sample partitioning
    in ONE program."""
    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.solve import stylize_single

    cpus = _cpu_devices(8)
    mesh = make_mesh((2, 4), ("spatial", "sample"), devices=cpus)
    content = jax.device_put(
        jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32), cpus[0]
    )
    style = jax.device_put(
        jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32), cpus[0]
    )
    params = jax.device_put(random_params("16", 0), cpus[0])

    def cfg(shard):
        return StrotssConfig(
            levels=1, max_iter=2, log_every=2, sample_size=32,
            compute_dtype="float32", use_pallas=False, precompile=False,
            taps=("block1_conv1",), shard_spatial=shard,
            shard_samples=shard,
        )

    _, info_ref = stylize_single(content, style, cfg(False), params)
    _, info_sh = stylize_single(content, style, cfg(True), params,
                                mesh=mesh)
    np.testing.assert_allclose(
        info_sh["scales"][0]["curve"], info_ref["scales"][0]["curve"],
        rtol=2e-4, atol=1e-5,
    )


def test_shard_spatial_requires_spatial_mesh(rng):
    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.solve import stylize_single

    content = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    cfg = StrotssConfig(levels=1, max_iter=1, shard_spatial=True,
                        taps=("block1_conv1",), use_pallas=False)
    params = random_params("16", 0)
    with pytest.raises(ValueError, match="'spatial' axis"):
        stylize_single(content, content, cfg, params)
    # a mesh without the axis is rejected too
    mesh = make_mesh((8,), ("sample",), devices=_cpu_devices(8))
    with pytest.raises(ValueError, match="'spatial' axis"):
        stylize_single(content, content, cfg, params, mesh=mesh)


def test_shard_spatial_rejected_in_batched(rng):
    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.parallel.batch import stylize_batch

    contents = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    cfg = StrotssConfig(levels=1, max_iter=1, shard_spatial=True,
                        taps=("block1_conv1",), use_pallas=False)
    with pytest.raises(ValueError, match="single-pair"):
        stylize_batch(contents, contents, cfg)


def test_batch_mesh_requires_data_axis(rng):
    """A mesh without a 'data' axis must fail upfront with the same
    friendly contract error as the 'sample'/'spatial' checks — not an
    opaque NamedSharding unbound-axis error at device_put."""
    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.parallel.batch import stylize_batch

    mesh = make_mesh((8,), ("sample",), devices=_cpu_devices(8))
    cfg = StrotssConfig(
        levels=1, max_iter=1, log_every=1, sample_size=16,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
    )
    contents = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    styles = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    with pytest.raises(ValueError, match="'data'"):
        stylize_batch(contents, styles, cfg,
                      vgg_params=random_params("16", 0), mesh=mesh)


def test_batched_warm_start_matches_single_runs(rng):
    """init_images keeps the per-pair exactness contract: pair b of a
    warm B=2 batched run equals ``stylize_single(init_image=inits[b],
    key=fold_in(key, b))`` — and the warm path actually changes the
    trajectory vs cold (the "mid" scale-0 seed is live in the batch)."""
    import jax

    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import random_params
    from strotss_tpu.parallel.batch import stylize_batch
    from strotss_tpu.solve import stylize_single

    contents = jnp.asarray(rng.random((2, 40, 40, 3)), jnp.float32)
    styles = jnp.asarray(rng.random((2, 40, 40, 3)), jnp.float32)
    inits = jnp.asarray(rng.random((2, 40, 40, 3)), jnp.float32)
    cfg = StrotssConfig(
        levels=1, max_iter=3, log_every=3, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
        precompile=False,
    )
    params = random_params("16", 0)
    key = jax.random.PRNGKey(7)

    out_b, info_b = stylize_batch(contents, styles, cfg, params, key=key,
                                  init_images=inits)
    out_cold, _ = stylize_batch(contents, styles, cfg, params, key=key)
    assert np.abs(
        np.asarray(out_b, np.int16) - np.asarray(out_cold, np.int16)
    ).max() > 0
    for b in range(2):
        out_s, info_s = stylize_single(
            contents[b:b + 1], styles[b:b + 1], cfg, params,
            key=jax.random.fold_in(key, b),
            init_image=inits[b:b + 1],
        )
        np.testing.assert_allclose(
            info_b["scales"][0]["curve"][:, b, :],
            info_s["scales"][0]["curve"],
            rtol=2e-4, atol=1e-6,
            err_msg=f"warm pair {b} trajectory diverged",
        )
        diff = np.abs(
            np.asarray(out_b[b], np.int16) - np.asarray(out_s, np.int16)
        )
        assert diff.max() <= 1, f"warm pair {b} image diverged"
