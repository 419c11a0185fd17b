"""Solver plumbing: chunk plans, resize arithmetic, Sinkhorn-mode step."""

import jax.numpy as jnp
import numpy as np

from strotss_tpu.config import StrotssConfig
from strotss_tpu.models.weights import random_params
from strotss_tpu.solve import chunk_plan, resize_max_hw, stylize_single


def test_chunk_plan():
    assert chunk_plan(200, 50) == [50, 50, 50, 50]
    assert chunk_plan(7, 3) == [3, 3, 1]
    assert chunk_plan(2, 50) == [2]
    assert chunk_plan(0, 50) == []
    assert chunk_plan(5, 1) == [1] * 5


def test_resize_max_hw():
    # matches the reference's truncating arithmetic (nn/utils.py:32-37)
    assert resize_max_hw(321, 481, 512) == (341, 512)
    assert resize_max_hw(48, 64, 128) == (96, 128)
    assert resize_max_hw(100, 50, None) == (100, 50)
    assert resize_max_hw(64, 42, 64) == (64, 42)


def test_stylize_sinkhorn_mode(rng):
    # config-5 style transport: full entropic OT instead of REMD
    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = StrotssConfig(
        levels=1, max_iter=2, log_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
        use_sinkhorn=True, sinkhorn_lambda=20.0, sinkhorn_iters=10,
    )
    img, info = stylize_single(content, style, cfg, params)
    assert np.isfinite(info["scales"][0]["loss"])
    assert img.dtype == jnp.uint8


def test_alpha_schedule_in_info(rng):
    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = StrotssConfig(
        levels=2, max_iter=2, log_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
    )
    _, info = stylize_single(content, style, cfg, params)
    alphas = [s["alpha"] for s in info["scales"]]
    assert alphas == [16.0, 8.0]  # run_strotss.py:65,155


def test_snapshot_cb_fires_at_save_every(rng):
    """cfg.save_every + snapshot_cb: intermediate images at chunk
    boundaries (the CLI's --save_every writes these to disk)."""
    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = StrotssConfig(
        levels=1, max_iter=4, log_every=2, save_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
    )
    calls = []
    stylize_single(content, style, cfg, params,
                   snapshot_cb=lambda scl, it, img: calls.append(
                       (scl, it, np.asarray(img))))
    assert [(s, i) for s, i, _ in calls] == [(64, 2), (64, 4)]
    for _, _, img in calls:
        assert img.dtype == np.uint8 and img.ndim == 3


def test_precompile_serves_every_chunk(rng, monkeypatch):
    """With precompile on, the AOT executables must serve ALL chunks of a
    fresh run — the jit fallback never fires (it's for resume signatures)."""
    import strotss_tpu.solve as solve

    content = jnp.asarray(rng.random((1, 40, 48, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 36, 44, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = StrotssConfig(
        levels=2, max_iter=3, log_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
    )
    ref_img, ref_info = stylize_single(content, style, cfg, params)

    real = solve.run_scale

    class TraceOnly:
        """precompile_scales may trace/lower; calling is the fallback."""

        def trace(self, *a, **k):
            return real.trace(*a, **k)

        def __call__(self, *a, **k):  # pragma: no cover - on regression
            raise AssertionError("jit fallback used despite precompile")

    monkeypatch.setattr(solve, "run_scale", TraceOnly())
    img, info = stylize_single(content, style, cfg, params)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref_img))
    assert [s["loss"] for s in info["scales"]] == [
        s["loss"] for s in ref_info["scales"]
    ]


def test_precompile_off_matches(rng):
    content = jnp.asarray(rng.random((1, 40, 48, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 36, 44, 3)), jnp.float32)
    params = random_params("16", 0)
    kw = dict(levels=1, max_iter=2, log_every=2, sample_size=32,
              compute_dtype="float32", use_pallas=False,
              taps=("block1_conv1",))
    img_a, _ = stylize_single(
        content, style, StrotssConfig(precompile=True, **kw), params)
    img_b, _ = stylize_single(
        content, style, StrotssConfig(precompile=False, **kw), params)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))


def test_scale_signatures_resume_aware():
    """precompile_scales must compile exactly the programs a resumed run
    will call: none for completed scales (their unconsumed compile futures
    would also stall the end-of-run metric fetch), the remaining-steps
    chunk plan with full-res ``prev`` at the checkpoint's scale, and the
    normal signatures afterwards."""
    from strotss_tpu.solve import _scale_signatures

    cfg = StrotssConfig(levels=3, max_iter=200, log_every=100)
    c, s = (1, 512, 512, 3), (1, 512, 512, 3)
    full = _scale_signatures(cfg, c, s)
    assert full == _scale_signatures(cfg, c, s, 0, 0)  # default unchanged

    res = _scale_signatures(cfg, c, s, resume_scale=1, resume_done=150)
    assert all(sig[0] >= 1 for sig in res), "completed scale 0 still listed"
    at1 = [sig for sig in res if sig[0] == 1]
    # 50 steps remain -> single 50-step chunk; prev is full-res content
    # (the skipped scale produced no stylized image)
    assert {sig[1] for sig in at1} == {50}
    assert all(sig[5] == c for sig in at1)
    # the scales after the resume point keep their normal-path signatures
    assert [sig for sig in res if sig[0] == 2] == \
        [sig for sig in full if sig[0] == 2]

    # zero steps remaining at the final chunk boundary: nothing to compile
    # for that scale, later scales unchanged
    res0 = _scale_signatures(cfg, c, s, resume_scale=1, resume_done=200)
    assert not [sig for sig in res0 if sig[0] == 1]
    assert [sig for sig in res0 if sig[0] == 2] == \
        [sig for sig in full if sig[0] == 2]


def test_snapshot_cadence_survives_coarse_log_every(rng):
    """save_every that doesn't match log_every still fires at every
    multiple: the solver re-chunks at gcd(log_every, save_every) when a
    snapshot consumer exists (with the default log_every=200, save_every=50
    used to fire exactly once, at step 200)."""
    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = StrotssConfig(
        levels=1, max_iter=6, log_every=6, save_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
    )
    calls = []
    stylize_single(content, style, cfg, params,
                   snapshot_cb=lambda scl, it, img: calls.append((scl, it)))
    assert calls == [(64, 2), (64, 4), (64, 6)]


def test_no_snapshot_cb_keeps_chunking(rng):
    """Without a snapshot consumer the save_every knob must NOT change the
    compiled chunk sizes (one chunk per scale stays one program)."""
    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = StrotssConfig(
        levels=1, max_iter=4, log_every=4, save_every=3, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
    )
    steps = []
    _, info = stylize_single(
        content, style, cfg, params,
        progress_cb=lambda scl, it, tot, m: steps.append(it))
    assert steps == [1, 2, 3, 4]
    assert info["scales"][0]["curve"].shape == (4, 3)


def test_warm_start_signatures():
    """warm_start flips scale 0's mode to "mid" and its ``prev`` aval to
    the init image at scale 0's chw (the API boundary resizes the init
    directly to the first executed scale's resolution — the exact
    resample a full run's handoff performs); everything downstream is
    unchanged, so warm starts add one program variant per shape bucket,
    not a new shape family."""
    from strotss_tpu.solve import _scale_signatures

    cfg = StrotssConfig(levels=2, max_iter=4, log_every=4)
    cshape, sshape = (1, 100, 80, 3), (1, 48, 64, 3)
    cold = _scale_signatures(cfg, cshape, sshape)
    warm = _scale_signatures(cfg, cshape, sshape, warm_start=True)
    assert cold[0][2] == "first" and warm[0][2] == "mid"
    assert warm[0][:2] == cold[0][:2] and warm[0][3:5] == cold[0][3:5]
    assert warm[1:] == cold[1:]
    # cold scale 0's prev is the full-res content; warm scale 0's is the
    # init at scale 0's chw (resize_max_hw(100, 80, 64) = (64, 51))
    assert cold[0][5] == cshape
    assert warm[0][5] == (1, 64, 51, 3)


def test_warm_start_init_image(rng):
    """init_image warm start: the first scale seeds from the init (the
    "mid" rule) instead of the cold content+style-mean seed — the result
    must differ from the cold run; and an init at any resolution gives
    the bit-exact same run as one pre-resized to the first scale's chw
    (ONE direct resize to that resolution is the only preprocessing)."""
    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = StrotssConfig(
        levels=1, max_iter=2, log_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
    )
    img_cold, _ = stylize_single(content, style, cfg, params)

    init_small = jnp.asarray(rng.random((1, 24, 20, 3)), jnp.float32)
    img_warm, info = stylize_single(
        content, style, cfg, params, init_image=init_small
    )
    assert img_warm.shape == img_cold.shape
    assert np.isfinite(info["scales"][0]["loss"])
    assert np.abs(
        np.asarray(img_warm, int) - np.asarray(img_cold, int)
    ).max() > 0

    from strotss_tpu.ops.image import resize_bilinear
    from strotss_tpu.solve import resize_max_hw

    chw0 = resize_max_hw(40, 40, 64)  # the first scale's resolution
    init_pre = resize_bilinear(init_small, chw0)
    img_warm2, _ = stylize_single(
        content, style, cfg, params, init_image=init_pre
    )
    np.testing.assert_array_equal(np.asarray(img_warm), np.asarray(img_warm2))


def test_start_level_refine_matches_full_run_tail(rng):
    """start_level + init_image reproduces a full run's fine-scale tail:
    run the coarse scale alone (levels=1 — identical program, keys, and
    alpha to the full run's scale 0), feed its FLOAT result
    (info["stylized"]) into a start_level=1 refine — the refine's scale-1
    trajectory and image must match the full levels=2 run's. Content is
    deliberately sized so the full-res shape (40x40) differs from every
    chw: the claim only holds because the API boundary resizes the init
    DIRECTLY to the first executed scale's chw (the same 64->128 resample
    the full run's handoff performs) — a detour through the full-res
    shape would compose two resamples and diverge."""
    import dataclasses

    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 96, 96, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = StrotssConfig(
        levels=2, max_iter=3, log_every=3, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
        precompile=False,
    )
    img_full, info_full = stylize_single(content, style, cfg, params)

    coarse = dataclasses.replace(cfg, levels=1)
    _, info_c = stylize_single(content, style, coarse, params)
    # levels=1 IS the full run's scale 0 (same mode/alpha/lr/keys)
    np.testing.assert_array_equal(
        info_c["scales"][0]["curve"], info_full["scales"][0]["curve"]
    )

    refine = dataclasses.replace(cfg, start_level=1)
    img_r, info_r = stylize_single(
        content, style, refine, params, init_image=info_c["stylized"]
    )
    assert len(info_r["scales"]) == 1
    assert info_r["scales"][0]["scale"] == 128
    # alpha halved once for the skipped scale, like the full run
    assert info_r["scales"][0]["alpha"] == info_full["scales"][1]["alpha"]
    np.testing.assert_allclose(
        info_r["scales"][0]["curve"], info_full["scales"][1]["curve"],
        rtol=2e-4, atol=1e-6,
    )
    diff = np.abs(
        np.asarray(img_r, np.int16) - np.asarray(img_full, np.int16)
    )
    assert diff.max() <= 1, f"refined image diverged (max {diff.max()})"


def test_start_level_validation():
    import pytest

    content = jnp.zeros((1, 40, 40, 3), jnp.float32)
    cfg = StrotssConfig(levels=2, start_level=2)
    with pytest.raises(ValueError, match="start_level"):
        stylize_single(content, content, cfg, random_params("16", 0))


def test_remat_is_numerically_exact(rng):
    """cfg.remat recomputes the VGG forward in the backward pass
    (jax.checkpoint) — same ops, same precisions, so the optimization
    trajectory and image must be IDENTICAL to the stored-activation
    run; only the memory/time trade changes."""
    import dataclasses

    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    cfg = StrotssConfig(
        levels=1, max_iter=3, log_every=3, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
    )
    img, info = stylize_single(content, style, cfg, params)
    img_r, info_r = stylize_single(
        content, style, dataclasses.replace(cfg, remat=True), params
    )
    np.testing.assert_allclose(
        info_r["scales"][0]["curve"], info["scales"][0]["curve"],
        rtol=1e-6, atol=1e-8,
    )
    diff = np.abs(np.asarray(img_r, np.int16) - np.asarray(img, np.int16))
    assert diff.max() <= 1
