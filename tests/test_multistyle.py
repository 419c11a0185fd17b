"""Multi-style blending: weighted-mixture style targets.

TPU-native extension (no reference analogue): ``stylize(content,
[style_a, style_b], style_weights=[w_a, w_b])`` draws
``style_sample_counts`` full-grid samples from each style's hypercolumn
and concatenates the rows into the standard (sample_size, C) style
target, so the loss stack (``/root/reference/run_strotss.py:27-41``)
is unchanged and optimizes against a weighted mixture of the styles.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from strotss_tpu.config import StrotssConfig
from strotss_tpu.models.weights import random_params
from strotss_tpu.solve import style_sample_counts, stylize_single


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


def _images(rng):
    content = jnp.asarray(rng.random((1, 40, 48, 3)), jnp.float32)
    style_a = jnp.asarray(rng.random((1, 44, 36, 3)), jnp.float32)
    style_b = jnp.asarray(rng.random((1, 28, 52, 3)), jnp.float32)
    return content, style_a, style_b


def test_style_sample_counts_apportionment():
    assert style_sample_counts([1.0], 64) == (64,)
    assert style_sample_counts([0.5, 0.5], 64) == (32, 32)
    assert style_sample_counts([2.0, 1.0, 1.0], 64) == (32, 16, 16)
    # largest-remainder with a tie: raw = 4.0/3.5/2.5, one seat short —
    # the stable sort hands it to the EARLIER of the .5 remainders
    assert style_sample_counts([0.4, 0.35, 0.25], 10) == (4, 4, 2)
    assert style_sample_counts([1.0, 0.0], 64) == (64, 0)
    # sum always preserved, any weights
    assert sum(style_sample_counts([0.3, 0.3, 0.4], 1024)) == 1024
    assert sum(style_sample_counts([1, 1, 1, 1, 1, 1, 1], 100)) == 100


def test_style_sample_counts_rejects_bad_weights():
    with pytest.raises(ValueError):
        style_sample_counts([-1.0, 2.0], 64)
    with pytest.raises(ValueError):
        style_sample_counts([0.0, 0.0], 64)
    with pytest.raises(ValueError):
        style_sample_counts([], 64)
    with pytest.raises(ValueError):
        style_sample_counts([float("nan"), 1.0], 64)


def test_multi_style_validation_errors(rng):
    content, style_a, style_b = _images(rng)
    params = random_params("16", 0)
    cfg = _tiny_cfg()
    with pytest.raises(ValueError, match="one weight per style"):
        stylize_single(content, [style_a, style_b], cfg, params,
                       style_weights=[1.0])
    with pytest.raises(ValueError, match="single style"):
        stylize_single(content, style_a, cfg, params,
                       style_weights=[1.0])
    with pytest.raises(ValueError, match="must not be empty"):
        stylize_single(content, [], cfg, params)
    masks = jnp.ones((1, 40, 48, 1), jnp.float32)
    smasks = jnp.ones((1, 44, 36, 1), jnp.float32)
    with pytest.raises(ValueError, match="incompatible with region masks"):
        stylize_single(content, [style_a, style_b], cfg, params,
                       content_masks=masks, style_masks=smasks,
                       style_weights=[0.5, 0.5])


@pytest.mark.slow
def test_zero_weight_style_reduces_to_single_run(rng):
    """weights=[1, 0] must drop style_b on host and reproduce the
    single-style run bit-exactly (same programs, same key stream)."""
    content, style_a, style_b = _images(rng)
    params = random_params("16", 0)
    cfg = _tiny_cfg()
    img_s, info_s = stylize_single(content, style_a, cfg, params)
    img_m, info_m = stylize_single(
        content, [style_a, style_b], cfg, params, style_weights=[1.0, 0.0]
    )
    np.testing.assert_array_equal(np.asarray(img_m), np.asarray(img_s))
    np.testing.assert_array_equal(
        info_m["scales"][0]["curve"], info_s["scales"][0]["curve"]
    )


@pytest.mark.slow
def test_blended_two_styles_end_to_end(rng):
    """A genuine 2-style blend (different style shapes) runs the multi
    program end-to-end with a finite loss and the single run's output
    geometry."""
    content, style_a, style_b = _images(rng)
    params = random_params("16", 0)
    cfg = _tiny_cfg()
    img, info = stylize_single(
        content, [style_a, style_b], cfg, params, style_weights=[0.7, 0.3]
    )
    assert img.dtype == jnp.uint8 and img.ndim == 3
    assert np.isfinite(info["scales"][0]["loss"])
    curve = info["scales"][0]["curve"]
    assert curve.shape == (cfg.max_iter, 3) and np.isfinite(curve).all()


def test_scale_signatures_multi_style_shapes():
    """Tuple style shapes produce per-style shw tuples at every scale —
    the static shw run_scale's blended programs are traced with."""
    from strotss_tpu.solve import _scale_signatures

    cfg = _tiny_cfg(levels=2)
    sigs = _scale_signatures(
        cfg, (1, 40, 48, 3), ((1, 44, 36, 3), (1, 28, 52, 3))
    )
    single = _scale_signatures(cfg, (1, 40, 48, 3), (1, 44, 36, 3))
    assert len(sigs) == len(single)
    for (_, _, _, chw_m, shw_m, prev_m), (_, _, _, chw_s, shw_s, prev_s) \
            in zip(sigs, single):
        assert chw_m == chw_s and prev_m == prev_s
        assert len(shw_m) == 2 and shw_m[0] == shw_s
        assert all(isinstance(hw, tuple) and len(hw) == 2 for hw in shw_m)


def test_scale_mode_shapes_single_source_of_truth():
    """``aot.scale_mode_shapes`` is the one place (mode, chw, shw) comes
    from — the solver loop and ``_scale_signatures`` both call it, so the
    AOT table keys can never drift from the programs the loop calls. Lock
    the mode schedule, the warm-start override, and the multi-style shw
    tuple here (pure function, no compile)."""
    from strotss_tpu.aot import scale_mode_shapes

    cfg = _tiny_cfg(levels=4)
    cshape, ashape, bshape = (1, 40, 48, 3), (1, 44, 36, 3), (1, 28, 52, 3)
    modes = [
        scale_mode_shapes(cfg, cshape, ashape, i, scl, False)[0]
        for i, scl in enumerate(cfg.scale_sizes())
    ]
    assert modes == ["first", "mid", "mid", "last"]
    # warm start rewrites ONLY scale 0's seed rule to "mid"
    warm = [
        scale_mode_shapes(cfg, cshape, ashape, i, scl, True)[0]
        for i, scl in enumerate(cfg.scale_sizes())
    ]
    assert warm == ["mid", "mid", "mid", "last"]
    # multi-style: shw is the per-style tuple, chw/mode unchanged
    scl0 = cfg.scale_sizes()[0]
    mode_s, chw_s, shw_s = scale_mode_shapes(cfg, cshape, ashape, 0, scl0,
                                             False)
    mode_m, chw_m, shw_m = scale_mode_shapes(
        cfg, cshape, (ashape, bshape), 0, scl0, False
    )
    assert (mode_m, chw_m) == (mode_s, chw_s)
    assert shw_m[0] == shw_s and len(shw_m) == 2
    # single-level config: i==0 wins, the only scale seeds as "first"
    cfg1 = _tiny_cfg(levels=1)
    assert scale_mode_shapes(cfg1, cshape, ashape, 0,
                             cfg1.scale_sizes()[0], False)[0] == "first"


@pytest.mark.slow
def test_blended_aot_precompile_matches_jit_path(rng):
    """The blended programs ride the AOT precompile path (VERDICT r4
    next-round 1c): the program table is populated, and the AOT-executed
    run is bit-identical to the jit-path run (same jaxpr, same key
    stream — only the compile/load orchestration differs)."""
    content, style_a, style_b = _images(rng)
    params = random_params("16", 0)
    img_a, info_a = stylize_single(
        content, [style_a, style_b], _tiny_cfg(), params,
        style_weights=[0.7, 0.3],
    )
    # the AOT table compiled this run's programs (one scale, chunks of 2)
    assert "programs" in info_a and len(info_a["programs"]) >= 1
    img_j, info_j = stylize_single(
        content, [style_a, style_b], _tiny_cfg(precompile=False), params,
        style_weights=[0.7, 0.3],
    )
    assert "programs" not in info_j
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_j))
    np.testing.assert_array_equal(
        info_a["scales"][0]["curve"], info_j["scales"][0]["curve"]
    )


@pytest.mark.slow
def test_blend_of_identical_styles_seeds_like_single(rng):
    """max_iter=0 isolates the first-scale seed: the weight-blended mean
    style color of [a, a] at 0.5/0.5 is bit-exactly a's mean (0.5m + 0.5m
    is exact in f32), so the seeded output must equal the single run's —
    this also exercises the zero-step run_scale call site with the
    multi-style arguments."""
    content, style_a, _ = _images(rng)
    params = random_params("16", 0)
    cfg = _tiny_cfg(max_iter=0)
    img_s, _ = stylize_single(content, style_a, cfg, params)
    img_m, _ = stylize_single(
        content, [style_a, style_a], cfg, params, style_weights=[0.5, 0.5]
    )
    np.testing.assert_array_equal(np.asarray(img_m), np.asarray(img_s))
