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


def test_resume_config_fingerprint_guard(rng, tmp_path):
    import pytest

    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    d = str(tmp_path / "ckpt")
    stylize_single(content, style, _cfg(2, d), params)
    # different pyramid depth => fingerprint mismatch => clean error
    bad = StrotssConfig(
        levels=2, max_iter=4, log_every=2, sample_size=32,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
        checkpoint_dir=d, pyramid_levels=3,
    )
    with pytest.raises(ValueError, match="different run configuration"):
        stylize_single(content, style, bad, params)
    # different content image shape is also refused
    content2 = jnp.asarray(rng.random((1, 44, 40, 3)), jnp.float32)
    with pytest.raises(ValueError, match="different run configuration"):
        stylize_single(content2, style, _cfg(2, d), params)


def test_legacy_checkpoint_without_fingerprint_resumes(rng, tmp_path):
    """Checkpoints from before fingerprints existed (fingerprint=None) are
    accepted with a warning, relying on the structure-digest guard —
    instead of being unconditionally refused (ADVICE r2)."""
    import json
    import os

    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    d = str(tmp_path / "ckpt")
    img_full, _ = stylize_single(content, style, _cfg(4), params)
    stylize_single(content, style, _cfg(4, d), params)
    # simulate a legacy checkpoint: strip the fingerprint from the meta
    meta_path = os.path.join(d, "state.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["fingerprint"] = None
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    img_resumed, _ = stylize_single(content, style, _cfg(4, d), params)
    np.testing.assert_array_equal(
        np.asarray(img_full), np.asarray(img_resumed)
    )


def test_restore_structure_digest_guard(tmp_path):
    """Same leaf count, different shapes => restore refuses cleanly."""
    import pytest

    from strotss_tpu.utils import checkpoint as ckpt

    d = str(tmp_path / "ckpt")
    state = (jnp.zeros((4, 4)), jnp.ones((2,)), jnp.zeros((2,), jnp.uint32))
    ckpt.save_state(d, 0, 1, 1.0, *state)
    # same number of leaves, same total elements in leaf 0, new shape
    bad_template = (
        jnp.zeros((2, 8)), jnp.ones((2,)), jnp.zeros((2,), jnp.uint32)
    )
    with pytest.raises(ValueError, match="structure"):
        ckpt.restore_state(d, bad_template)
    # the matching template restores fine
    out = ckpt.restore_state(d, state)
    assert out[0].shape == (4, 4)


def test_per_step_progress_and_curve(rng):
    """progress_cb fires once per optimization step; info carries the
    full loss curve (VERDICT r1 item 6; reference run_strotss.py:148-152)."""
    content = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 40, 40, 3)), jnp.float32)
    params = random_params("16", 0)
    calls = []
    img, info = stylize_single(
        content, style, _cfg(4), params,
        progress_cb=lambda scl, done, total, m: calls.append((scl, done, m)),
    )
    # 2 scales x 4 steps, each step reported exactly once, in order
    assert [c[1] for c in calls] == [1, 2, 3, 4, 1, 2, 3, 4]
    assert all(np.isfinite(c[2]["loss"]) for c in calls)
    for s in info["scales"]:
        assert s["curve"].shape == (4, 3)
    # the replayed per-step metrics match the curve
    np.testing.assert_allclose(
        [c[2]["loss"] for c in calls[:4]], info["scales"][0]["curve"][:, 0]
    )

def test_torn_sidecar_meta_is_ignored(tmp_path):
    """The authoritative meta rides inside state.npz (same atomic replace
    as the leaves). A crash between the npz replace and the sidecar-json
    replace must not pair new state with stale metadata — that would make
    a resume silently re-run a chunk on the already-advanced state."""
    import os
    import shutil

    from strotss_tpu.utils import checkpoint as C

    d = str(tmp_path / "ck")
    pyr = (np.zeros((1, 4, 4, 3), np.float32),)
    opt = {"nu": np.zeros((1, 4, 4, 3), np.float32)}
    key = np.zeros((2,), np.uint32)
    C.save_state(d, 0, 100, 1.0, pyr, opt, key)
    stale = str(tmp_path / "stale.json")
    shutil.copy(os.path.join(d, "state.json"), stale)
    C.save_state(d, 1, 200, 1.0, pyr, opt, key)
    # simulate the crash window: new npz on disk, sidecar still the old one
    shutil.copy(stale, os.path.join(d, "state.json"))
    meta = C.load_meta(d)
    assert meta["scale_index"] == 1 and meta["done_steps"] == 200


def test_legacy_sidecar_only_meta_still_loads(tmp_path):
    """Checkpoints written before the embedded-meta format (sidecar json
    only) keep loading."""
    import json as _json

    from strotss_tpu.utils import checkpoint as C

    d = tmp_path / "ck"
    d.mkdir()
    np.savez(str(d / "state.npz"), leaf_0=np.zeros((2,), np.float32))
    with open(d / "state.json", "w") as f:
        _json.dump({"scale_index": 2, "done_steps": 50}, f)
    meta = C.load_meta(str(d))
    assert meta["scale_index"] == 2 and meta["done_steps"] == 50
