"""Static-shape hypercolumn feature sampling.

The reference (``/root/reference/nn/strotss_utils.py:20-136``) samples 1024
spatial locations by building a coordinate list (full meshgrid for style /
random-offset strided grid for content+prediction), optionally filtering rows
by a mask (data-dependent shape!), shuffling pairs, and truncating. That is
unjittable on TPU, so the design here is different but distributionally
equivalent:

- *shuffle + truncate to k* == *uniform sample of k without replacement* ==
  **Gumbel top-k** over uniform logits — one ``lax.top_k``, fully static.
- mask filtering becomes ``-inf`` logits on invalid points; when a region has
  fewer than ``sample_size`` valid points the reference silently produces a
  smaller matrix (dynamic shape); we instead resample the shortfall *with
  replacement* via ``jax.random.categorical``, keeping every downstream loss
  shape static. (Distribution differs only in that degenerate case.)
- the strided grid's random offsets make the grid *length* data-dependent in
  the reference (``X = tf.range(h)[off::step]``); we allocate the static
  worst case ``ceil(h/step)`` and mark out-of-range points invalid.

Coordinates are sampled once per step at the base (image) resolution and
rescaled per feature map with the same cumulative-ratio chain as the
reference (``nn/strotss_utils.py:33-37``), computed statically from shapes.
Content and prediction are gathered at **identical** coordinates; style is
gathered once per scale on the full grid with nearest-neighbor lookup.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from strotss_tpu.ops.image import resize_bilinear

_NEG_INF = -jnp.inf


# --------------------------------------------------------------------------
# static helpers
# --------------------------------------------------------------------------

def coordinate_factors(shapes: Sequence[Tuple[int, int]]) -> List[float]:
    """Per-map multiplier taking base-resolution coords to map ``i`` coords.

    Replicates the reference's cumulative in-place divides: when the height
    drops between consecutive hypercolumn entries, coordinates are divided by
    the consecutive ratio along a single axis chosen once — H if the current
    height is a power of two, else W (``nn/strotss_utils.py:33-37``).
    """
    factors = [1.0]
    f = 1.0
    axis = None
    for i in range(1, len(shapes)):
        if shapes[i][0] < shapes[i - 1][0]:
            if axis is None:
                axis = 0 if (math.log2(shapes[i][0]) % 1 == 0) else 1
            f /= shapes[i - 1][axis] / shapes[i][axis]
        factors.append(f)
    return factors


def strided_grid_params(h: int, w: int) -> Tuple[int, int, int, int]:
    """(step_x, step_y, nx, ny) for the content sampling grid.

    ``area = sqrt((h*w) // 128²)``; x-step floors, y-step ceils
    (``nn/strotss_utils.py:89-90``). ``nx/ny`` are the static worst-case
    point counts per axis.
    """
    area = math.sqrt((h * w) // (128 ** 2))
    step_x = max(1, math.floor(area))
    step_y = max(1, math.ceil(area))
    nx = -(-h // step_x)
    ny = -(-w // step_y)
    return step_x, step_y, nx, ny


# --------------------------------------------------------------------------
# masks
# --------------------------------------------------------------------------

def prepare_mask(mask: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize a (H,W,1)/(1,H,W,1) mask to ``hw`` and threshold at 0.5.

    Returns a float (h,w) validity map in {0,1}. Reproduces the reference's
    all-pass escape hatch: if the resized mask's max is < 0.1 every pixel is
    valid (``nn/strotss_utils.py:105-110``).
    """
    if mask.ndim == 4:
        mask = mask[0]
    m = resize_bilinear(mask.astype(jnp.float32), hw)[..., 0]
    valid = (m > 0.5).astype(jnp.float32)
    allpass = jnp.max(m) < 0.1
    return jnp.where(allpass, jnp.ones_like(valid), valid)


# --------------------------------------------------------------------------
# coordinate selection
# --------------------------------------------------------------------------

def _select_k(key: jax.Array, logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Sample ``k`` indices ~ without replacement from ``exp(logits)``.

    Gumbel top-k; entries that still land on ``-inf`` logits (fewer than k
    valid points) are replaced by categorical draws with replacement from
    the valid set.
    """
    p = logits.shape[0]
    if p < k:
        logits = jnp.pad(logits, (0, k - p), constant_values=_NEG_INF)
        p = k
    k_gumbel, k_rep = jax.random.split(key)
    scores = logits + jax.random.gumbel(k_gumbel, (p,), dtype=jnp.float32)
    _, idx = jax.lax.top_k(scores, k)
    picked_valid = jnp.take(logits, idx) > _NEG_INF
    replacement = jax.random.categorical(k_rep, logits, shape=(k,))
    return jnp.where(picked_valid, idx, replacement)


def _check_mask_hw(mask: jnp.ndarray, hw: Tuple[int, int]) -> None:
    """A prepared mask must live at the BASE-grid resolution — a mask at
    any other size would silently draw coordinates from the wrong index
    domain (shapes are static, so this is a free trace-time check)."""
    if tuple(mask.shape) != tuple(hw):
        raise ValueError(
            f"sampling mask has shape {tuple(mask.shape)} but the base "
            f"grid is {tuple(hw)}; resize it first (prepare_mask)"
        )


def full_grid_coords(
    key: jax.Array,
    hw: Tuple[int, int],
    sample_size: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Uniformly pick ``sample_size`` pixel coords from the full (h,w) grid.

    Style-sampling mode (reference ``__call__`` with
    ``bilinear_sampling=False``: full meshgrid → mask filter → shuffle →
    truncate).  Returns float32 (sample_size, 2) = (row, col).
    """
    h, w = hw
    if mask is not None:
        _check_mask_hw(mask, hw)
        valid = mask.reshape(-1) > 0.5
        # grid-level allpass escape: a region that leaves NO valid pixel
        # at this scale (possible even past prepare_mask's max<0.1 hatch,
        # e.g. a resized max of 0.3 with nothing over the 0.5 threshold)
        # would otherwise make every logit -inf and silently collapse all
        # samples onto index 0 — fall back to the full grid instead
        valid = jnp.where(jnp.any(valid), valid, True)
        logits = jnp.where(valid, 0.0, _NEG_INF)
    else:
        logits = jnp.zeros((h * w,), dtype=jnp.float32)
    idx = _select_k(key, logits, sample_size)
    coords = jnp.stack([idx // w, idx % w], axis=1)
    return coords.astype(jnp.float32)


def strided_grid_coords(
    key: jax.Array,
    hw: Tuple[int, int],
    sample_size: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pick ``sample_size`` coords from a random-offset strided grid.

    Content/prediction sampling mode: integer offsets uniform in
    [0, step) per axis, grid points ``off + i*step``, uniform choice of
    ``sample_size`` of the in-bounds (and in-mask) points
    (``nn/strotss_utils.py:88-120``).
    """
    h, w = hw
    step_x, step_y, nx, ny = strided_grid_params(h, w)
    k_off, k_sel = jax.random.split(key)
    off = jax.random.randint(k_off, (2,), 0, jnp.asarray([step_x, step_y]))
    xs = off[0] + jnp.arange(nx, dtype=jnp.int32) * step_x
    ys = off[1] + jnp.arange(ny, dtype=jnp.int32) * step_y
    gx = jnp.repeat(xs, ny)
    gy = jnp.tile(ys, nx)
    inb = (gx < h) & (gy < w)
    valid = inb
    if mask is not None:
        _check_mask_hw(mask, hw)
        mval = mask[jnp.clip(gx, 0, h - 1), jnp.clip(gy, 0, w - 1)]
        valid = valid & (mval > 0.5)
        # grid-level allpass escape: a thin region can fall entirely
        # between the strided grid's points for some random offsets —
        # all-(-inf) logits would silently collapse every sample onto
        # grid point 0; fall back to the in-bounds grid for this draw
        valid = jnp.where(jnp.any(valid), valid, inb)
    logits = jnp.where(valid, 0.0, _NEG_INF)
    idx = _select_k(k_sel, logits, sample_size)
    coords = jnp.stack([jnp.take(gx, idx), jnp.take(gy, idx)], axis=1)
    return coords.astype(jnp.float32)


# --------------------------------------------------------------------------
# gathers
# --------------------------------------------------------------------------

def _squeeze_map(fmap: jnp.ndarray) -> jnp.ndarray:
    return fmap[0] if fmap.ndim == 4 else fmap


def bilinear_gather(fmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """4-tap bilinear lookup of (n,2) float coords on an (h,w,c) map.

    Border handling matches the reference (``nn/strotss_utils.py:43-70``):
    floor/floor+1 corner indices clipped independently to the valid range.

    All four corners ride ONE gather (and one scatter-add in the VJP):
    TPU gathers pay a large fixed per-op cost, so 4x-fewer, 4x-bigger
    gathers are markedly faster than one per corner (the sampling segment
    of the train step is gather-overhead-bound, not bandwidth-bound).
    """
    fmap = _squeeze_map(fmap)
    h, w, c = fmap.shape
    gx, gy = coords[:, 0], coords[:, 1]
    gxf = jnp.floor(gx)
    gyf = jnp.floor(gy)
    dx = gx - gxf
    dy = gy - gyf

    x0 = jnp.clip(gxf, 0, h - 1).astype(jnp.int32)
    y0 = jnp.clip(gyf, 0, w - 1).astype(jnp.int32)
    x1 = jnp.clip(gxf + 1, 0, h - 1).astype(jnp.int32)
    y1 = jnp.clip(gyf + 1, 0, w - 1).astype(jnp.int32)

    flat = fmap.reshape(h * w, c)
    idx = jnp.stack(
        [x0 * w + y0, x0 * w + y1, x1 * w + y0, x1 * w + y1]
    )  # (4, n)
    g = jnp.take(flat, idx.reshape(-1), axis=0).reshape(4, -1, c)
    # interpolate in f32 regardless of map dtype: the gathered bf16 corner
    # values are exact, and f32 weighting avoids stacking a second rounding
    # onto already-quantized features (the blend feeds the loss stack,
    # which is f32) — bandwidth cost is unchanged, the gather stays bf16
    g = g.astype(jnp.float32)
    dxf = dx.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    wts = jnp.stack(
        [
            (1 - dxf) * (1 - dyf),
            (1 - dxf) * dyf,
            dxf * (1 - dyf),
            dxf * dyf,
        ]
    )[:, :, None]  # (4, n, 1)
    return jnp.sum(g * wts, axis=0)


def bilinear_weight_matrix(
    hw: Tuple[int, int], coords: jnp.ndarray,
    integer_coords: bool = False,
) -> jnp.ndarray:
    """Dense (n, h·w) f32 matrix performing the 4-tap bilinear lookup.

    Row ``i`` holds the four corner weights of ``coords[i]`` at the
    corners' flat positions (clipped duplicates accumulate, matching the
    gather's weighted sum). Built with 4 compare-and-add passes over the
    (n, h·w) plane — no scatter. ``W @ fmap.reshape(h·w, c)`` equals
    ``bilinear_gather(fmap, coords)`` exactly (in f32/HIGHEST), and its
    VJP is the transposed matmul: sampling becomes two MXU matmuls
    instead of a gather plus a scatter-add, which is the winning
    formulation on TPU wherever h·w is small (see
    ``sample_hypercolumn``'s gate and tools/bench_gather.py).

    ``integer_coords=True`` asserts every coordinate is an exact integer
    (true for the strided/full sampling grids at base resolution): the
    bilinear weights degenerate to a single 1.0 at corner (x0, y0) and
    the build is one compare pass instead of four — bit-identical
    output, the remaining three corners carry exact zeros.
    """
    h, w = hw
    gx, gy = coords[:, 0], coords[:, 1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], h * w), 1)
    if integer_coords:
        x0 = jnp.clip(gx, 0, h - 1).astype(jnp.int32)
        y0 = jnp.clip(gy, 0, w - 1).astype(jnp.int32)
        idx = x0 * w + y0
        return (pos == idx[:, None]).astype(jnp.float32)
    gxf = jnp.floor(gx)
    gyf = jnp.floor(gy)
    dx = (gx - gxf).astype(jnp.float32)
    dy = (gy - gyf).astype(jnp.float32)

    x0 = jnp.clip(gxf, 0, h - 1).astype(jnp.int32)
    y0 = jnp.clip(gyf, 0, w - 1).astype(jnp.int32)
    x1 = jnp.clip(gxf + 1, 0, h - 1).astype(jnp.int32)
    y1 = jnp.clip(gyf + 1, 0, w - 1).astype(jnp.int32)

    mat = jnp.zeros((coords.shape[0], h * w), jnp.float32)
    for idx, wt in (
        (x0 * w + y0, (1 - dx) * (1 - dy)),
        (x0 * w + y1, (1 - dx) * dy),
        (x1 * w + y0, dx * (1 - dy)),
        (x1 * w + y1, dx * dy),
    ):
        mat = mat + jnp.where(pos == idx[:, None], wt[:, None], 0.0)
    return mat


def nearest_gather(fmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Truncating nearest lookup (clip float coords, cast to int32)."""
    fmap = _squeeze_map(fmap)
    h, w, c = fmap.shape
    gx = jnp.clip(coords[:, 0], 0, h - 1).astype(jnp.int32)
    gy = jnp.clip(coords[:, 1], 0, w - 1).astype(jnp.int32)
    return jnp.take(fmap.reshape(h * w, c), gx * w + gy, axis=0)


# Bilinear sampling rides one-hot MXU matmuls for the WHOLE hypercolumn
# when the largest (base-resolution) map has at most this many pixels;
# otherwise every map keeps the fused 4-corner gather. All-or-nothing on
# the base map, not per-map, and the boundary is measured, full-step, on
# v5e (tools/bench_gather.py isolation + tools/trace_step.py in situ):
# gating ONLY the small deep taps is strictly slower at every scale (the
# win comes from replacing the base-resolution gathers or nothing), and
# the crossover depends on the matmul precision, so the gate is derived
# from it:
#
#   'high' (3-pass bf16, ~1e-6 rel — the bf16 mode's loss precision;
#   deviations this size are absorbed bit-exactly by the f32 pyramid
#   state, docs/PARITY.md): 64px step 2.28 → 1.78 ms (−22%), 128px
#   2.75 → 2.64 — gate 12288 admits both coarse scales (bases
#   2688/10880 px), where 600 of the default run's 800 steps execute.
#
#   'highest' (6-pass, numerically IDENTICAL to the gather — the f32
#   exactness mode): 64px 2.28 → 1.87, but 128px regresses to 3.02 (the
#   6-pass matmuls outgrow the saved gather overhead) — gate 4096.
#
# Env overrides for A/B runs only.
_MATMUL_PX = {"high": 12288, "highest": 4096}
_MATMUL_PX_ENV = os.environ.get("STROTSS_SAMPLE_MATMUL_PX")
_PREC_ENV = os.environ.get("STROTSS_SAMPLE_MATMUL_PREC")
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
}


def sample_hypercolumn(
    feats: Sequence[jnp.ndarray],
    coords: jnp.ndarray,
    bilinear: bool = True,
    matmul_px: int = -1,
    matmul_prec: str = "highest",
    integer_coords: bool = False,
) -> jnp.ndarray:
    """Sample every feature map at (rescaled) ``coords``; concat channels.

    ``integer_coords=True`` asserts the BASE-resolution coords are exact
    integers (true for both sampling grids): maps with coordinate factor
    1.0 then skip the 4-corner interpolation — a single-row gather /
    one-pass weight matrix, bit-identical by construction (the dropped
    corners carry exact zero weights). Deeper maps (fractional factor)
    are unaffected.

    Bilinear sampling dispatches by the static base-map pixel count (see
    ``_MATMUL_PX``): at coarse scales the whole hypercolumn rides one-hot
    MXU matmuls (``bilinear_weight_matrix`` — shared across maps with the
    same shape+factor; VJP is the transposed matmul instead of a
    scatter-add), at fine scales every map uses the fused 4-corner
    gather. ``matmul_prec='highest'`` is numerically identical to the
    gather (exact f32 weights); ``'high'`` matches the bf16 mode's loss
    precision (~1e-6 rel) and halves the matmul passes, moving the
    crossover. (Channel-concatenating same-resolution maps to share a
    gather was measured SLOWER on TPU: the per-step concat
    materialization costs more than the saved per-gather overhead.)

    Returns float32 (n, total_channels) — the hypercolumn matrix that all
    losses consume (2179 channels for the default VGG16 tap set + image).
    """
    prec_name = _PREC_ENV or matmul_prec
    if matmul_px < 0:
        if _MATMUL_PX_ENV is not None:
            matmul_px = int(_MATMUL_PX_ENV)
        else:
            # precisions without a measured crossover (e.g. the loss
            # ladder's experimental 'default') gate to 0: plain gathers,
            # exactly the pre-matmul-sampling behavior
            matmul_px = _MATMUL_PX.get(prec_name, 0)
    shapes = [(_squeeze_map(f).shape[0], _squeeze_map(f).shape[1]) for f in feats]
    factors = coordinate_factors(shapes)
    use_matmul = bilinear and max(h * w for h, w in shapes) <= matmul_px
    mats: dict = {}
    parts = []
    for fmap, (hw, fac) in zip(feats, zip(shapes, factors)):
        c = coords * fac if fac != 1.0 else coords
        exact = integer_coords and fac == 1.0
        if not bilinear:
            g = nearest_gather(fmap, c)
        elif use_matmul:
            key = (hw, fac)
            if key not in mats:
                mats[key] = bilinear_weight_matrix(hw, c, exact)
            flat = _squeeze_map(fmap).reshape(hw[0] * hw[1], -1)
            g = jnp.dot(mats[key], flat.astype(jnp.float32),
                        precision=_PRECISIONS[prec_name])
        elif exact:
            # integer coords: bilinear == nearest, 4x less gather traffic
            g = nearest_gather(fmap, c)
        else:
            g = bilinear_gather(fmap, c)
        parts.append(g.astype(jnp.float32))
    return jnp.concatenate(parts, axis=1)


def sample_hypercolumn_matmul(
    feats: Sequence[jnp.ndarray], coords: jnp.ndarray
) -> jnp.ndarray:
    """All-matmul bilinear hypercolumn (gate forced open; tests/bench)."""
    return sample_hypercolumn(feats, coords, bilinear=True,
                              matmul_px=2 ** 62)


# --------------------------------------------------------------------------
# high-level entry points (mirror Sampling.__call__ / .bilinear)
# --------------------------------------------------------------------------

def sample_style(
    key: jax.Array,
    feats: Sequence[jnp.ndarray],
    sample_size: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Style-target sampling: full grid, nearest gather. Once per scale."""
    base = _squeeze_map(feats[0])
    coords = full_grid_coords(key, base.shape[:2], sample_size, mask)
    return sample_hypercolumn(feats, coords, bilinear=False)


def sample_paired(
    key: jax.Array,
    xs: Sequence[jnp.ndarray],
    ys: Sequence[jnp.ndarray],
    sample_size: int,
    mask: Optional[jnp.ndarray] = None,
    matmul_prec: str = "highest",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Content/prediction sampling at shared coords: strided grid, bilinear.

    Every optimization step draws a fresh grid offset and subset (the
    reference's stateful RNG ops re-execute inside ``tf.function``;
    here the key is threaded through the scan). ``matmul_prec`` follows
    the caller's loss precision ('high' under the bf16 policy, 'highest'
    under f32 — see ``sample_hypercolumn``).
    """
    base = _squeeze_map(xs[0])
    coords = strided_grid_coords(key, base.shape[:2], sample_size, mask)
    # the strided grid's base coords are exact integers -> the factor-1.0
    # maps skip the (degenerate) 4-corner interpolation, bit-identically
    return (
        sample_hypercolumn(xs, coords, bilinear=True,
                           matmul_prec=matmul_prec, integer_coords=True),
        sample_hypercolumn(ys, coords, bilinear=True,
                           matmul_prec=matmul_prec, integer_coords=True),
    )


class Sampling:
    """Stateful convenience wrapper mirroring the reference's ``Sampling``
    module API (``nn/strotss_utils.py:20-136``): ``Sampling(n)(xs)`` for
    style targets, ``.bilinear(xs, ys, mask=...)`` for paired
    content/prediction sampling.

    The reference relies on stateful TF RNG ops; here each call advances an
    internal PRNG key. This wrapper is host-side sugar — inside ``jit``/
    ``scan`` use the functional API (`sample_style`/`sample_paired`) with an
    explicit key.
    """

    def __init__(self, sample_size: int, seed: int = 0):
        self.sample_size = sample_size
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    def __call__(self, xs, ys=None, mask=None, bilinear_sampling=False):
        key = self._next_key()
        base = _squeeze_map(xs[0])
        hw = base.shape[:2]
        if mask is not None and mask.ndim != 2:
            mask = prepare_mask(mask, hw)
        if bilinear_sampling:
            coords = strided_grid_coords(key, hw, self.sample_size, mask)
        else:
            coords = full_grid_coords(key, hw, self.sample_size, mask)
        # both grids produce exact-integer base coords (see sample_paired)
        ret = sample_hypercolumn(xs, coords, bilinear=bilinear_sampling,
                                 integer_coords=True)
        if ys is not None:
            return ret, sample_hypercolumn(
                ys, coords, bilinear=bilinear_sampling, integer_coords=True)
        return ret

    def bilinear(self, xs, ys=None, mask=None):
        return self(xs, ys=ys, mask=mask, bilinear_sampling=True)
