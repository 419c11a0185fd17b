"""The coarse-to-fine STROTSS optimizer, compiled as jit + lax.scan.

Reference structure (``/root/reference/run_strotss.py:43-161``): a Python
loop over scales (64→128→256→512 long edge); per scale, 200 RMSprop steps on
the Laplacian-pyramid coefficients of the stylized image. The reference
round-trips gradients to the host **every step** (``tf.function`` returns
grads; ``opt.apply_gradients`` runs eagerly, ``run_strotss.py:147-148``).

Here the whole inner loop is a ``lax.scan`` whose body is
``sample → VGG forward → losses → grad → RMSprop update`` — zero host
crossings inside a scale. The chunk runner is a single **module-level** jit
with every changing value (features, style targets, masks, α, lr) passed as
arguments and all configuration in a hashable static spec: repeated
stylizations (benchmark loops, batched serving) reuse the compile cache —
only genuinely new image shapes trigger a trace. α and lr are traced
scalars, so the per-scale α-halving / lr schedule costs zero recompiles.

RMSprop matches Keras semantics exactly: ``v ← ρ v + (1-ρ) g²;
θ ← θ − lr·g/√(v+ε)`` with ρ=0.99, ε=1e-8 (``run_strotss.py:63``) — i.e.
``optax.rmsprop(lr, decay=0.99, eps=1e-8)`` (golden test in
tests/test_solve.py). Optimizer slots restart at zero each scale because the
reference allocates fresh ``tf.Variable`` objects per scale
(``run_strotss.py:89``).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from strotss_tpu.config import StrotssConfig
from strotss_tpu.models.vgg import STROTSS_DEFAULT_TAPS, vgg_apply
from strotss_tpu.ops.image import (
    cap_max,
    fold_laplacian_pyramid,
    make_laplacian,
    make_laplacian_pyramid,
    postprocess,
    resize_bilinear,
)
from strotss_tpu.ops.losses import content_loss, style_loss
from strotss_tpu.ops.sampling import (
    prepare_mask,
    sample_paired,
    sample_style,
)


def _source_tag_dim() -> int:
    """A 1..64 dimension derived from the package's source bytes.

    Measurement hygiene for remote-compile backends whose executable
    caches and load paths are outside our control: every big jitted
    program takes a zeros((tag_dim,)) argument that feeds a
    ``+ 0.0 * sum(tag)`` into one output, so any source change shifts
    the program *signature* — A/B perf or parity runs of different code
    can never be conflated by any cache layer keyed more coarsely than
    the HLO body. Cost: one tiny dead-weight argument per program.
    Collision chance per change: 1/64 (sha256 of module sources, mod 64).

    **Opt-in** via ``STROTSS_SOURCE_TAG=1`` (for A/B measurement runs of
    different code revisions). Default OFF: the signature then stays
    constant across commits, so body-identical programs reuse the
    persistent compile cache — with it always on, every source change
    (even to comments) guaranteed a fully cold compile, which is exactly
    what the round-2 driver measured (607 s warmup, VERDICT r2 weak #1).
    """
    import hashlib
    import os

    if os.environ.get("STROTSS_SOURCE_TAG", "0") in ("", "0", "false"):
        return 1
    pkg = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(pkg)):
        if "__pycache__" in root:
            continue
        for f in sorted(files):
            if f.endswith(".py"):
                with open(os.path.join(root, f), "rb") as fh:
                    h.update(fh.read())
    return int.from_bytes(h.digest()[:4], "big") % 64 + 1


_SRC_TAG_DIM = _source_tag_dim()


def source_tag() -> np.ndarray:
    """Host zeros array whose SHAPE encodes the package source hash
    (constant (1,) unless ``STROTSS_SOURCE_TAG=1``, see _source_tag_dim)."""
    return np.zeros((_SRC_TAG_DIM,), np.float32)


class StepSpec(NamedTuple):
    """Hashable static configuration of one optimization step."""

    sample_size: int
    vgg_type: str
    taps: tuple
    preprocess_mode: str
    compute_dtype: str
    use_sinkhorn: bool
    sinkhorn_lambda: float
    sinkhorn_iters: int
    remd_impl: str
    selfsim_impl: str
    shard_samples: bool = False
    #: shard image/feature-map HEIGHT over the mesh's 'spatial' axis —
    #: GSPMD partitions the conv stack (fwd+bwd) with halo exchanges,
    #: scaling one high-res stylization across chips (config.shard_spatial).
    shard_spatial: bool = False
    #: matmul precision for the loss stack: 'highest' (exact f32) under
    #: f32 features; 'high' (3-pass bf16, ~1e-6 rel) under bf16 features,
    #: whose quantization noise dwarfs the matmul rounding — ~2x faster.
    loss_precision: str = "highest"
    #: VGG block1: 'xla' (lax convs) or 'pallas' (fused kernel; bf16
    #: mixed-policy single-image runs only — see config.block1_impl).
    block1_impl: str = "xla"
    #: rematerialize the VGG forward in the backward pass
    #: (``jax.checkpoint``): activations are recomputed instead of stored,
    #: trading ~1 extra forward of FLOPs for a ~3x smaller live-activation
    #: footprint — raises the single-chip resolution ceiling
    #: (config.remat; measured in tools/mem_report.py --remat).
    remat: bool = False


def spec_from_config(
    cfg: StrotssConfig, masked: bool = False, batched: bool = False
) -> StepSpec:
    # auto: Pallas only where the tiled kernels actually win (large sample
    # counts); the masked AND batched paths vmap (regions / pairs) -> force
    # the XLA impl there (vmap over pallas_call/custom_vjp may not
    # batch/lower on TPU)
    impl = "auto" if (cfg.use_pallas and not masked and not batched) else "xla"
    # block1 kernel: 'auto' resolves to XLA — the fused Pallas block1 was
    # built, verified, and MEASURED SLOWER than the lax convs (fwd 1.92 vs
    # 1.23 ms, fwd+bwd 11.1 vs 2.7 ms at 512px; per-component attribution
    # in docs/MXU.md — Mosaic relayouts for the shifted conv taps plus the
    # C<=64 lane padding cost more than the XLA conv emitter's overhead).
    # Kept as an explicit opt-in for future re-evaluation; single-image
    # bf16-policy programs only (the batched path vmaps pairs; GSPMD
    # sample-sharding partitions whole programs; f32 mode is the exactness
    # mode with HIGHEST-precision convs).
    b1 = cfg.block1_impl
    if b1 == "auto" or batched or cfg.shard_samples or cfg.shard_spatial or (
            cfg.compute_dtype != "bfloat16"):
        b1 = "xla"
    return StepSpec(
        sample_size=cfg.sample_size,
        vgg_type=cfg.vgg_type,
        taps=tuple(cfg.taps or STROTSS_DEFAULT_TAPS),
        preprocess_mode="keras" if cfg.use_keras_weight else "norm",
        compute_dtype=cfg.compute_dtype,
        use_sinkhorn=cfg.use_sinkhorn,
        sinkhorn_lambda=cfg.sinkhorn_lambda,
        sinkhorn_iters=cfg.sinkhorn_iters,
        # sample-axis/spatial sharding uses plain-XLA loss impls: GSPMD
        # partitions them automatically; the Pallas kernels are
        # single-device programs
        remat=cfg.remat,
        remd_impl="xla" if (cfg.shard_samples or cfg.shard_spatial) else impl,
        selfsim_impl=(
            "xla" if (cfg.shard_samples or cfg.shard_spatial) else impl
        ),
        shard_samples=cfg.shard_samples,
        shard_spatial=cfg.shard_spatial,
        loss_precision=(
            "high" if cfg.compute_dtype == "bfloat16" else "highest"
        ),
        block1_impl=b1,
    )


def make_optimizer(lr) -> optax.GradientTransformation:
    """TF/Keras-equivalent RMSprop (rho=0.99, eps=1e-8, eps inside sqrt).

    ``lr`` may be a traced scalar: it is injected as optimizer-state so the
    per-scale schedule doesn't force a retrace.
    """
    return optax.inject_hyperparams(optax.rmsprop)(
        learning_rate=lr, decay=0.99, eps=1e-8
    )


def extract_hypercolumn(spec: StepSpec, vgg_params, img: jnp.ndarray):
    """Image -> hypercolumn list [image, tap1..tapK] (run_strotss.py:95-96)."""
    dtype = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else jnp.float32
    feats = vgg_apply(
        vgg_params,
        img,
        taps=spec.taps,
        vgg_type=spec.vgg_type,
        preprocess_mode=spec.preprocess_mode,
        compute_dtype=dtype,
        block1_impl=spec.block1_impl,
    )
    return [img] + feats


@partial(jax.jit, static_argnames=("spec",))
def _extract_j(spec: StepSpec, vgg_params, img):
    return extract_hypercolumn(spec, vgg_params, img)


def extract_for_grad(spec: StepSpec, vgg_params, img: jnp.ndarray):
    """The loss-path extraction: like :func:`extract_hypercolumn`, but
    under ``spec.remat`` the VGG forward is wrapped in ``jax.checkpoint``
    so the backward pass RECOMPUTES the conv activations instead of
    storing them — one extra forward of FLOPs for a ~3x smaller
    live-activation footprint (the dominant term in the finest-scale
    program's temp memory; tools/mem_report.py). Only this grad-carrying
    call site remats: the per-scale content/style extractions are
    forward-only, so XLA keeps no activations for them anyway."""
    if not spec.remat:
        return extract_hypercolumn(spec, vgg_params, img)
    return jax.checkpoint(
        extract_hypercolumn, static_argnums=(0,)
    )(spec, vgg_params, img)


def resize_max_hw(h: int, w: int, max_size: Optional[int]) -> Tuple[int, int]:
    """Target (h, w) of the aspect-preserving resize (``nn/utils.py:32-37``)."""
    if max_size is None:
        return h, w
    factor = max(h / max_size, w / max_size)
    return int(h / factor), int(w / factor)


def warm_init_hw(content_h: int, content_w: int,
                 cfg: StrotssConfig) -> Tuple[int, int]:
    """The (h, w) a warm-start ``init_image`` is resized to: the first
    *executed* scale's resolution (``cfg.start_level``'s scale).

    The exactness contract for warm starts is ONE direct resize to this
    shape — the same resample a full run's scale handoff performs on its
    predecessor (``_scale_seed`` "mid"/"last") — so a refine seeded with
    ``info["stylized"]`` reproduces the full run's tail. Every caller
    that pre-resizes inits (``serve._run_batch`` stacks per-job inits)
    MUST use this helper: a detour through any other shape (e.g. the
    content's) composes two bilinear resamples and silently deviates.
    """
    return resize_max_hw(content_h, content_w,
                         cfg.scale_sizes()[cfg.start_level])


def _scale_seed(mode: str, chw, shw, levels: int, content, style, prev,
                style_weights=None):
    """Per-scale init math (run_strotss.py:74-89): resize inputs, build the
    Laplacian seed, split into pyramid variables.

    Multi-style blending: ``style`` may be a TUPLE of (1,H,W,3) images with
    a matching tuple ``shw`` of per-style target shapes and a traced (S,)
    ``style_weights`` vector; the first scale's mean-color seed then uses
    the weight-blended mean (``run_strotss.py:76-79`` generalized), and
    ``scl_s`` is the tuple of per-style resizes."""
    scl_c = resize_bilinear(content, chw)
    if isinstance(style, tuple):
        scl_s = tuple(
            resize_bilinear(s, hw) for s, hw in zip(style, shw)
        )
    else:
        scl_s = resize_bilinear(style, shw)
    lap = make_laplacian(scl_c)
    if mode == "first":
        # mean color computed only in this branch: tracing it in mid/last
        # would add dead ops to the jaxpr and shift the persistent
        # compile-cache key of every existing mid/last program
        if isinstance(scl_s, tuple):
            w = style_weights / jnp.sum(style_weights)
            mean_color = sum(
                w[i] * jnp.mean(s, axis=(1, 2), keepdims=True)
                for i, s in enumerate(scl_s)
            )
        else:
            mean_color = jnp.mean(scl_s, axis=(1, 2), keepdims=True)
        sty = lap + mean_color
    elif mode == "mid":
        sty = resize_bilinear(prev, chw) + lap
    else:
        sty = resize_bilinear(prev, chw)
    return scl_c, scl_s, tuple(make_laplacian_pyramid(sty, levels))


@partial(jax.jit, static_argnames=("mode", "chw", "shw", "levels"))
def _scale_init_j(mode: str, chw, shw, levels: int, content, style, prev):
    return _scale_seed(mode, chw, shw, levels, content, style, prev)


@partial(jax.jit, static_argnames=("hw",))
def _prepare_masks_j(masks, hw):
    return jax.vmap(lambda m: prepare_mask(m, hw))(masks)


def normalize_key(key):
    """Accept both PRNG-key flavors at the public API boundary.

    The AOT-precompiled per-scale programs are signed for the raw
    (2,)-uint32 key layout; a new-style typed key (``jax.random.key``)
    would reach the executable as a scalar ``key<fry>`` aval and fail the
    call with a TypeError AFTER the full precompile cost was paid.
    ``jax.random.key_data`` is stream-preserving for the default
    threefry impl (legacy and typed keys share it)."""
    import jax.dtypes

    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    return key


def _sample_style_targets(spec: StepSpec, k_style, style_feats,
                          style_masks=None, shw=None):
    """Per-scale style targets: (n, C) unmasked, or (K, n, C) masked —
    each RAW (K, H, W, 1) region mask is prepared at the style resolution
    ``shw`` and sampled under. Shared by ``prepare_scale``, ``run_scale``
    and the tools' ``_style_targets_j`` so the three call sites cannot
    drift apart."""
    if style_masks is None:
        return sample_style(k_style, style_feats, spec.sample_size)
    smasks = jax.vmap(lambda m: prepare_mask(m, shw))(style_masks)
    keys = jax.random.split(k_style, smasks.shape[0])
    return jax.vmap(
        lambda m, k: sample_style(k, style_feats, spec.sample_size, m)
    )(smasks, keys)


@partial(jax.jit, static_argnames=("spec", "shw"))
def _style_targets_j(spec: StepSpec, key, style_feats, style_masks=None,
                     shw=None):
    """Jitted entry for tools/ (raw masks; see _sample_style_targets)."""
    return _sample_style_targets(spec, key, style_feats, style_masks, shw)


def style_sample_counts(style_weights, sample_size: int) -> Tuple[int, ...]:
    """Host-side largest-remainder apportionment of ``sample_size`` style
    samples among blended styles.

    Multi-style blending draws ``n_i`` full-grid style samples from style
    ``i`` proportional to its weight and concatenates the rows into the
    usual (sample_size, C) style target, so the whole loss stack (REMD,
    moments, palette — ``run_strotss.py:27-41``) is unchanged and sees a
    weighted MIXTURE of the styles. Counts must be static (they size the
    per-style gathers), so the apportionment runs on host: floor each
    ``w_i * n``, then hand the remaining samples to the largest fractional
    remainders (ties broken toward earlier styles for determinism).
    """
    w = np.asarray(style_weights, np.float64)
    if w.ndim != 1 or w.size == 0:
        raise ValueError(
            f"style_weights must be a 1-D sequence, got shape {w.shape}"
        )
    if not np.all(np.isfinite(w)) or np.any(w < 0) or w.sum() <= 0:
        raise ValueError(
            "style_weights must be finite, >= 0, with a positive sum, got "
            f"{list(map(float, w))}"
        )
    raw = w / w.sum() * sample_size
    base = np.floor(raw).astype(np.int64)
    short = sample_size - int(base.sum())
    # stable argsort on the negated remainder: earlier styles win ties
    order = np.argsort(-(raw - base), kind="stable")
    base[order[:short]] += 1
    return tuple(int(b) for b in base)


def _sample_multi_style_targets(spec: StepSpec, k_style, style_feats_list,
                                style_ns: Tuple[int, ...]):
    """Blended style target: ``style_ns[i]`` full-grid samples from style
    ``i``'s hypercolumn (its own key stream), rows concatenated to the
    standard (sample_size, C) matrix. With a single style and
    ``style_ns == (sample_size,)`` the split-key stream differs from the
    single-style path — callers collapse that case upstream instead."""
    keys = jax.random.split(k_style, len(style_feats_list))
    parts = [
        sample_style(k, feats, n)
        for k, feats, n in zip(keys, style_feats_list, style_ns)
    ]
    return jnp.concatenate(parts, axis=0)


@partial(
    jax.jit,
    static_argnames=("spec", "mode", "chw", "shw", "levels"),
)
def prepare_scale(
    spec: StepSpec,
    mode: str,
    chw,
    shw,
    levels: int,
    vgg_params,
    content,
    style,
    prev,
    k_style,
    lr,
    content_masks=None,
    style_masks=None,
):
    """The entire per-scale setup as ONE jitted program.

    Fuses what round 1 ran as 5+ separate programs per scale (scale init,
    two hypercolumn extractions, style-target sampling, mask prep, optimizer
    init) — each a 20-120 s remote-compile round trip on this backend — into
    a single trace: resize both inputs, build the Laplacian-pyramid seed,
    extract both VGG hypercolumns, sample the style targets (per region when
    masked), resize/threshold the content masks, and init the RMSprop state.

    Reference analogue: the per-scale body of ``run_strotss.py:74-101,128``.
    """
    scl_c, scl_s, pyramid = _scale_seed(
        mode, chw, shw, levels, content, style, prev
    )
    content_feats = extract_hypercolumn(spec, vgg_params, scl_c)
    style_feats = extract_hypercolumn(spec, vgg_params, scl_s)

    style_targets = _sample_style_targets(
        spec, k_style, style_feats, style_masks, shw
    )

    cmasks = None
    if content_masks is not None:
        cmasks = jax.vmap(lambda m: prepare_mask(m, chw))(content_masks)

    opt_state = make_optimizer(lr).init(pyramid)
    return pyramid, content_feats, style_targets, cmasks, opt_state


@partial(
    jax.jit,
    static_argnames=("spec", "n_steps", "mode", "chw", "shw", "levels",
                     "mesh", "style_ns"),
    donate_argnames=("pyramid", "opt_state", "key"),
)
def run_scale(
    spec: StepSpec,
    n_steps: int,
    mode: str,
    chw,
    shw,
    levels: int,
    vgg_params,
    content,
    style,
    prev,
    is_first,
    k_style,
    pyramid,
    opt_state,
    key,
    alpha,
    lr,
    content_masks=None,
    style_masks=None,
    src_tag=None,
    mesh=None,
    style_weights=None,
    style_ns=None,
):
    """Per-scale setup + ``n_steps`` optimization steps as ONE program.

    ``src_tag`` (see :func:`source_tag`) shifts the program signature with
    the package source hash — required on remote-compile backends whose
    executable cache can return stale binaries for body-only changes.

    The whole default run compiles to a single program per scale: resize,
    Laplacian seed, both VGG hypercolumn extractions, style-target
    sampling, mask prep, optimizer init, the step scan, and the folded /
    postprocessed output image. On this environment's remote-compile relay
    every separate program costs a 2-120 s round trip (and concurrent
    relay requests thrash), so program count — not compile size — is what
    governs both cold and warm start latency.

    ``is_first`` (traced bool) selects the freshly-seeded pyramid/optimizer
    on the first chunk of a scale and the carried state afterwards, so one
    signature serves every chunk; first-chunk callers pass host-built
    zero templates (see :func:`scale_state_templates`). The setup work
    (two VGG forwards, style sampling) reruns per chunk — identical
    results, keyed by ``k_style`` — which costs ~nothing at the default
    one-chunk-per-scale and a few ms per extra chunk when a finer
    ``log_every``/checkpoint cadence is requested.
    """
    multi = isinstance(style, tuple)
    scl_c, scl_s, seed_pyramid = _scale_seed(
        mode, chw, shw, levels, content, style, prev, style_weights
    )
    if spec.shard_spatial:
        # one annotation per image: GSPMD spatially partitions both VGG
        # extractions (and, via loss_fn's matching constraint, the
        # per-step fwd+bwd conv stack) across the mesh's 'spatial' axis
        scl_c = _shard_spatial_constraint(scl_c, mesh)
        if multi:
            scl_s = tuple(
                _shard_spatial_constraint(s, mesh) for s in scl_s
            )
        else:
            scl_s = _shard_spatial_constraint(scl_s, mesh)
    content_feats = extract_hypercolumn(spec, vgg_params, scl_c)

    if multi:
        # blended style target: per-style hypercolumns, style_ns[i]
        # full-grid samples each, rows concatenated (see
        # style_sample_counts). Masks are rejected upstream.
        style_feats_list = [
            extract_hypercolumn(spec, vgg_params, s) for s in scl_s
        ]
        style_targets = _sample_multi_style_targets(
            spec, k_style, style_feats_list, style_ns
        )
    else:
        style_feats = extract_hypercolumn(spec, vgg_params, scl_s)
        style_targets = _sample_style_targets(
            spec, k_style, style_feats, style_masks, shw
        )

    cmasks = None
    if content_masks is not None:
        cmasks = jax.vmap(lambda m: prepare_mask(m, chw))(content_masks)

    style_moments = style_target_moments(
        spec, style_targets, masked=style_masks is not None
    )

    pyramid = jax.tree.map(
        lambda s, p: jnp.where(is_first, s, p), tuple(seed_pyramid),
        tuple(pyramid),
    )
    fresh_opt = make_optimizer(lr).init(pyramid)
    opt_state = jax.tree.map(
        lambda f, o: jnp.where(is_first, f, o), fresh_opt, opt_state
    )

    (pyramid, opt_state, key), metrics = _optimization_scan(
        spec, n_steps, vgg_params, content_feats, style_targets, cmasks,
        alpha, lr, pyramid, opt_state, key, mesh, style_moments,
    )
    if src_tag is not None:
        # exact zero; exists so the source-hash-shaped arg is live (see
        # source_tag) — jit would otherwise prune it from the executable
        metrics = metrics + 0.0 * jnp.sum(src_tag)
    img = fold_laplacian_pyramid(pyramid)
    return pyramid, opt_state, key, metrics, img, postprocess(img)


def _optimization_scan(spec, n_steps, vgg_params, content_feats,
                       style_targets, content_masks, alpha, lr,
                       pyramid, opt_state, key, mesh, style_moments):
    """The shared hot loop: ``n_steps`` of sample → VGG fwd → losses →
    grad → RMSprop, as one ``lax.scan``. Both per-scale programs
    (:func:`run_scale`, :func:`run_chunk`) wrap exactly this body, so loss
    or sharding changes cannot drift between them. Returns
    ``((pyramid, opt_state, key), (n_steps, 3) metrics)``."""
    opt = make_optimizer(lr)

    def loss_fn(pyr, k):
        img = fold_laplacian_pyramid(pyr)
        if spec.shard_spatial:
            img = _shard_spatial_constraint(img, mesh)
        pred = extract_for_grad(spec, vgg_params, img)
        return _step_losses(
            spec, content_feats, pred, style_targets, content_masks,
            alpha, k, mesh=mesh, style_moments=style_moments,
        )

    def step(carry, _):
        pyr, ostate, k = carry
        k, k_step = jax.random.split(k)
        (loss, (lc, ls)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(pyr, k_step)
        updates, ostate = opt.update(grads, ostate)
        pyr = optax.apply_updates(pyr, updates)
        return (pyr, ostate, k), jnp.stack([loss, lc, ls])

    return jax.lax.scan(
        step, (pyramid, opt_state, key), None, length=n_steps
    )


def scale_state_templates(chw, pyramid_levels: int, lr: float):
    """Host-built zero (pyramid, opt_state) templates for a scale.

    Structure/dtypes exactly match what ``run_scale``'s in-program init
    produces (RMSprop slots and count init to zero; the hyperparams lr
    leaf is overwritten by the traced value under ``is_first``), so the
    first chunk can pass plain zeros and checkpoint restores have a
    template without running any compiled program.
    """
    from strotss_tpu.ops.image import laplacian_pyramid_shapes

    shapes = laplacian_pyramid_shapes(chw, pyramid_levels)
    pyr = tuple(
        jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32) for h, w in shapes
    )
    opt_shapes = jax.eval_shape(
        lambda p: make_optimizer(jnp.float32(lr)).init(p), pyr
    )
    zeros = lambda s: np.zeros(s.shape, s.dtype)  # noqa: E731
    return (
        tuple(np.zeros((1, h, w, 3), np.float32) for h, w in shapes),
        jax.tree.map(zeros, opt_shapes),
    )


def _shard_samples_constraint(x, mesh, axis: str = "sample"):
    """Constrain the leading (sample) axis of a sampled feature matrix to a
    mesh axis; XLA GSPMD then partitions the downstream distance-matrix
    matmuls / reductions and inserts the ICI collectives itself.

    This is the scaling-book recipe (annotate shardings, let XLA insert
    collectives) and — unlike an explicit shard_map — composes freely with
    the batching vmap and the training scan. The handwritten shard_map
    path in ``strotss_tpu.parallel.transport`` stays as the validated
    numerical reference for these collectives.
    """
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(*([None] * (x.ndim - 2) + [axis, None]))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _shard_spatial_constraint(x, mesh, axis: str = "spatial"):
    """Constrain an NHWC tensor's HEIGHT onto the mesh's ``axis``.

    One annotation on the scale-resized images is enough: GSPMD propagates
    it through the whole conv stack — forward convs become spatially
    partitioned with automatic halo exchanges over ICI, and their
    transposed backward convs inherit the same partitioning. The loss-side
    (n, C) sample matrices are tiny; XLA re-gathers/replicates them at the
    sampling boundary on its own. H (not W) is the sharded dim so row-major
    layouts stay contiguous per shard.
    """
    if mesh is None or axis not in mesh.axis_names:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(None, axis, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def style_target_moments(spec: StepSpec, style_targets, masked: bool):
    """Precompute the style targets' :func:`moment_stats` (mean + C x C
    covariance) once per scale. Targets are per-scale constants
    (``run_strotss.py:27-41,128``), so the solvers hoist this out of the
    step scan — numerically identical to recomputing per step, and it
    halves the moment-matching matmul cost of every step."""
    from strotss_tpu.ops.losses import moment_stats

    stats = partial(moment_stats, precision=spec.loss_precision)
    if masked:
        return jax.vmap(stats)(style_targets)
    return stats(style_targets)


def _step_losses(spec, content_feats, pred, style_targets, content_masks,
                 alpha, key, region_valid=None, mesh=None,
                 style_moments=None):
    """(loss, loss_c, loss_s) for one step; alpha is a traced scalar.

    ``region_valid``: optional (K,) 0/1 weights for padded region stacks
    (batched masked mode pads every pair to MAX_REGIONS; padding regions
    carry weight 0). ``mesh``: optional mesh with a 'sample' axis — the
    sampled feature matrices get sharding constraints on the sample axis so
    the N² transport losses are partitioned across devices.
    ``style_moments``: optional precomputed :func:`style_target_moments`
    (the scan-invariant target half of moment matching).
    """
    denom = 2.0 + alpha + 1.0 / jnp.maximum(alpha, 1.0)

    def one(target, tmom, mask, k):
        c_feat, p_feat = sample_paired(
            k, content_feats, pred, spec.sample_size, mask,
            matmul_prec=spec.loss_precision,
        )
        if spec.shard_samples:
            c_feat = _shard_samples_constraint(c_feat, mesh)
            p_feat = _shard_samples_constraint(p_feat, mesh)
            target = _shard_samples_constraint(target, mesh)
        lc = content_loss(
            c_feat, p_feat, impl=spec.selfsim_impl,
            precision=spec.loss_precision,
        )
        ls = style_loss(
            target,
            p_feat,
            alpha,
            use_sinkhorn=spec.use_sinkhorn,
            sinkhorn_lambda=spec.sinkhorn_lambda,
            sinkhorn_iters=spec.sinkhorn_iters,
            remd_impl=spec.remd_impl,
            precision=spec.loss_precision,
            target_moments=tmom,
        )
        return lc, ls

    if content_masks is None:
        lc, ls = one(style_targets, style_moments, None, key)
        loss = (alpha * lc + ls) / denom
        return loss, (lc, ls)
    n_regions = content_masks.shape[0]
    keys = jax.random.split(key, n_regions)
    lcs, lss = jax.vmap(
        one, in_axes=(0, None if style_moments is None else 0, 0, 0)
    )(style_targets, style_moments, content_masks, keys)
    if region_valid is None:
        w = jnp.full((n_regions,), 1.0 / n_regions, jnp.float32)
    else:
        w = region_valid / jnp.maximum(jnp.sum(region_valid), 1.0)
    loss = jnp.sum(w * (alpha * lcs + lss) / denom)
    return loss, (jnp.sum(w * lcs), jnp.sum(w * lss))


@partial(
    jax.jit,
    static_argnames=("spec", "n_steps", "mesh"),
    donate_argnames=("pyramid", "opt_state", "key"),
)
def run_chunk(
    spec: StepSpec,
    n_steps: int,
    vgg_params,
    content_feats,
    style_targets,
    content_masks,
    pyramid,
    opt_state,
    key,
    alpha,
    lr,
    src_tag=None,
    mesh=None,
):
    """``n_steps`` optimization steps as one on-device scan.

    Everything dynamic is an argument; the jit cache is keyed only by
    (spec, n_steps, shapes) so repeated runs and the α/lr schedules never
    retrace. ``pyramid``/``opt_state`` are donated for in-place reuse.

    Besides the per-step (n, 3) metric block (loss / loss_c / loss_s rows —
    the host replays them for the per-step progress display,
    ``run_strotss.py:148-152``), also returns the folded stylized image and
    its uint8 postprocess — so scale handoff and snapshotting need no extra
    compiled programs.
    """
    style_moments = style_target_moments(
        spec, style_targets, masked=content_masks is not None
    )
    (pyramid, opt_state, key), metrics = _optimization_scan(
        spec, n_steps, vgg_params, content_feats, style_targets,
        content_masks, alpha, lr, pyramid, opt_state, key, mesh,
        style_moments,
    )
    if src_tag is not None:
        metrics = metrics + 0.0 * jnp.sum(src_tag)  # see source_tag
    img = fold_laplacian_pyramid(pyramid)
    return pyramid, opt_state, key, metrics, img, postprocess(img)


def init_opt_state(lr: float, pyramid) -> optax.OptState:
    return make_optimizer(jnp.asarray(lr, jnp.float32)).init(pyramid)


def chunk_plan(max_iter: int, log_every: int) -> List[int]:
    """Uniform chunks (plus at most one remainder size) to bound traces."""
    log_every = max(1, min(log_every, max_iter))
    plan = [log_every] * (max_iter // log_every)
    if max_iter % log_every:
        plan.append(max_iter % log_every)
    return plan


def _scale_signatures(
    cfg: StrotssConfig,
    content_shape,
    style_shape,
    resume_scale: int = 0,
    resume_done: int = 0,
    warm_start: bool = False,
):
    """The run_scale signatures the solver loop will call, one per
    (scale, chunk) — resume-aware, so a resumed run precompiles exactly the
    programs it needs (not the completed scales' ones, whose unconsumed
    compile futures would also stall the end-of-run metric fetch).

    ``prev`` (the previous scale's stylized image) has the PREVIOUS scale's
    chw shape — except at the first *executed* scale, where it's the
    full-resolution content (scale 0 normally; the checkpoint's scale on
    resume, because the skipped scales produce no stylized image), or, on
    warm-start runs, the init image at the start scale's chw.
    """
    sigs = []
    prev_shape = tuple(content_shape)
    if warm_start:
        # a warm run's first executed scale takes the init image as
        # ``prev``, already resized to that API-boundary chw (the first
        # scale of the schedule, or cfg.start_level's scale — resume can
        # only land at or after it, and skipped scales produce no image)
        chw0 = warm_init_hw(content_shape[1], content_shape[2], cfg)
        prev_shape = (1, chw0[0], chw0[1], 3)
    for i, scl in enumerate(cfg.scale_sizes()):
        chw = resize_max_hw(content_shape[1], content_shape[2], scl)
        shw = resize_max_hw(style_shape[1], style_shape[2], scl)
        mode = "first" if i == 0 else ("mid" if i < cfg.levels - 1 else "last")
        if i == 0 and warm_start:
            # warm start: scale 0 seeds from the init image via the "mid"
            # rule (resize(init) + content Laplacian) instead of the cold
            # style-mean seed — same program signature as "mid" scales,
            # just at the coarse resolution (stylize_single's init_image)
            mode = "mid"
        if i >= resume_scale:
            steps = cfg.max_iter - (resume_done if i == resume_scale else 0)
            for n in dict.fromkeys(chunk_plan(steps, cfg.log_every)):
                sigs.append((i, n, mode, chw, shw, prev_shape))
            # prev advances only once a scale actually executes (skipped
            # scales leave ``stylized`` as the full-res content)
            prev_shape = (1, chw[0], chw[1], 3)
    return sigs


class PrecompiledPrograms:
    """Future-backed AOT program table.

    ``get(key)`` blocks until that one program's compile lands (returns
    None on a key miss or failed compile, falling back to the jit path).
    The solver consumes programs per scale in coarse-to-fine order while
    later scales are still compiling in worker threads — so the 64px scale
    starts *executing* as soon as its own program is ready instead of
    waiting for all four (VERDICT r2 weak #8 / next-round 1d).

    ``timings``: per-key ``{"lower": s, "compile": s}`` — plus, filled in
    by the solver, ``"first_call"`` (first execution incl. the one-time
    remote program load) — so a slow warmup is attributable per program.
    """

    def __init__(self, futures: Dict, timings: Dict):
        self._futs = futures
        self.timings = timings

    def get(self, key):
        fut = self._futs.get(key)
        if fut is None:
            return None
        try:
            return fut.result()
        except Exception:  # fall back to the jit path for this program
            return None

    def wait_all(self) -> None:
        for k in list(self._futs):
            self.get(k)

    def pending(self) -> bool:
        """True while any compile is still in flight. Host transfers
        (device_get) through this backend's relay can stall for minutes
        when issued concurrently with compile RPCs (measured via stack
        dumps: the 150-500 s warmups were a device_get at solve's chunk
        loop, not compilation). The solver now defers metric fetches in
        EVERY callback-free run (not just while this is True), so this
        is kept purely as a diagnostic."""
        return any(not f.done() for f in self._futs.values())


# program signatures whose one-time remote load was already forced this
# process (see the STROTSS_PRELOAD throwaway in precompile_scales) —
# repeat stylizations must not re-pay the throwaway's device work
_PRELOADED: set = set()
_PRELOADED_LOCK = None  # created lazily (threading import)


def _preload_enabled() -> bool:
    """Gate for the throwaway-execution program preload (default ON).

    On this backend the relay loads each compiled program into the device
    server lazily, at its first execution — and that load is the dominant,
    previously-unattributed term of slow warmups (24-46 s healthy,
    125-820 s after heavy relay use, BENCH_r03's 259.6 s). The lever:
    as each program's compile RPC lands in its worker thread, fire ONE
    throwaway execution on scratch inputs and device_get a small output —
    the loads then overlap each other and the coarse scales' real
    execution instead of serializing on the first real call of each
    program. Costs one extra execution of each program (~4.4 s device
    time for the default config) the FIRST time a signature is seen in a
    process (``_PRELOADED``); measured on chip in ROUND4.md.
    """
    import os

    return os.environ.get("STROTSS_PRELOAD", "1") not in ("0", "false")


def precompile_scales(
    cfg: StrotssConfig,
    spec: StepSpec,
    vgg_params,
    content_shape,
    style_shape,
    content_masks=None,
    style_masks=None,
    max_workers: Optional[int] = None,
    resume_scale: int = 0,
    resume_done: int = 0,
    warm_start: bool = False,
    content=None,
    style=None,
    preload: bool = False,
) -> PrecompiledPrograms:
    """AOT-compile every per-scale program, overlapping the slow compiles.

    Tracing/lowering is Python (GIL-bound, ~1-2 s per scale) and runs
    sequentially; ``.compile()`` is a remote-relay RPC on this backend
    (2-30 s each, GIL released) and runs across ``max_workers`` threads
    (env ``STROTSS_COMPILE_WORKERS``, default 4). Compiles are submitted
    in coarse-to-fine order and consumed lazily (see
    :class:`PrecompiledPrograms`), so the cold start pays
    ~compile(64px) before first execution instead of sum(compile).

    Returns a :class:`PrecompiledPrograms` keyed by
    ``(scale_idx, n_steps, prev_shape)``; callers fall back to the jit
    path on a key miss (resume signatures) or a failed compile. The AOT
    executables are keyed by exact input avals — ``stylize_single`` passes
    strongly-typed scalars so the calls match.

    ``content``/``style``: the real (device-resident) images, if the
    caller has them — the program-load throwaways (see
    :func:`_preload_enabled`) then reuse them (and ``vgg_params``, ~59 MB)
    instead of transferring fresh zeros through the tunnel per program.

    ``preload``: opt-in to the program-load throwaway executions. Only
    callers that will EXECUTE the programs (``stylize_single``) should
    pass True — analysis tools (``tools/mem_report.py``,
    ``tools/bench_aot_cache.py``) compile programs they never intend to
    run, some of which may OOM at execute time (mem_report probes the
    capacity boundary on purpose), so executing a throwaway there would
    burn device minutes or wedge the backend. ``STROTSS_PRELOAD=0``
    still force-disables it for opted-in callers.
    """
    import os
    import threading
    from concurrent.futures import ThreadPoolExecutor

    global _PRELOADED_LOCK
    if _PRELOADED_LOCK is None:
        _PRELOADED_LOCK = threading.Lock()

    if max_workers is None:
        max_workers = int(os.environ.get("STROTSS_COMPILE_WORKERS", "4"))

    aval = lambda a: jax.ShapeDtypeStruct(  # noqa: E731
        # a.dtype, never np.asarray(a).dtype: masks can be device-resident
        # and a host copy just to read the dtype is a stall hazard here
        np.shape(a), getattr(a, "dtype", None) or np.asarray(a).dtype
    )
    p_avals = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), vgg_params
    )
    key_aval = jax.ShapeDtypeStruct((2,), jnp.uint32)
    f32 = jax.ShapeDtypeStruct((), jnp.float32)
    boolv = jax.ShapeDtypeStruct((), jnp.bool_)
    cmask_avals = None if content_masks is None else aval(content_masks)
    smask_avals = None if style_masks is None else aval(style_masks)
    tag_aval = jax.ShapeDtypeStruct((_SRC_TAG_DIM,), jnp.float32)

    timings: Dict = {}

    def throwaway_args(dyn_avals):
        """Scratch call args for one program-load throwaway: real
        device-resident arrays where the caller provided them (params,
        images, masks — all non-donated in run_scale), fresh zeros for
        the donated state (pyramid/opt/key) and scalars. Every zeros()
        call makes a DISTINCT buffer: aliasing one buffer into a donated
        and a non-donated param is an execute-time INVALID_ARGUMENT on
        this backend."""
        (p_av, c_av, s_av, prev_av, _isf, _kst, pyr_av, opt_av, _krun,
         _a_av, _lr_av, cm_av, sm_av, tag_av) = dyn_avals
        zero = lambda a: np.zeros(a.shape, a.dtype)  # noqa: E731
        return (
            vgg_params,
            content if content is not None else zero(c_av),
            style if style is not None else zero(s_av),
            zero(prev_av),
            np.zeros((), np.bool_),
            np.zeros((2,), np.uint32),
            jax.tree.map(zero, pyr_av),
            jax.tree.map(zero, opt_av),
            np.zeros((2,), np.uint32),
            np.float32(1.0),
            np.float32(cfg.lr),
            content_masks if cm_av is not None else None,
            style_masks if sm_av is not None else None,
            zero(tag_av),
        )

    def compile_one(key, lo, dyn_avals):
        t0 = time.perf_counter()
        out = lo.compile()
        timings[key]["compile"] = time.perf_counter() - t0
        if dyn_avals is not None:
            # force the relay's one-time program load NOW, off the
            # critical path: one throwaway execution + a small device_get
            # (block_until_ready returns before the load completes on this
            # backend; only device_get truly waits). The load then
            # overlaps the other programs' loads and the coarse scales'
            # real execution (VERDICT r3 next-round 1b).
            t0 = time.perf_counter()
            try:
                outs = out(*throwaway_args(dyn_avals))
                jax.device_get(outs[3])  # metrics: (n, 3), tiny
                timings[key]["load"] = time.perf_counter() - t0
            except Exception:  # never poison the compile future
                timings[key]["load"] = -1.0
        return out

    # Tracing/lowering is Python/GIL-bound (~1.5 s per scale): keep it
    # SERIAL on this thread — measured: four threads tracing concurrently
    # thrash the GIL to ~7 s each for zero wall-clock gain. Each compile
    # (a GIL-releasing relay RPC) is submitted the moment its lower
    # finishes, so the 64px compile is in flight while 128-512px still
    # lower, and the caller's first get() typically returns right after
    # the lowering loop. The executor is intentionally not shut down with
    # wait=True — queued compiles keep running while the solver executes
    # earlier scales, and get() joins per program.
    ex = ThreadPoolExecutor(max_workers=max_workers)
    futs = {}
    for i, n, mode, chw, shw, prev_shape in _scale_signatures(
        cfg, content_shape, style_shape, resume_scale, resume_done,
        warm_start,
    ):
        pyr, opt = scale_state_templates(chw, cfg.pyramid_levels, cfg.lr)
        args = (
            spec, n, mode, chw, shw, cfg.pyramid_levels, p_avals,
            jax.ShapeDtypeStruct(tuple(content_shape), jnp.float32),
            jax.ShapeDtypeStruct(tuple(style_shape), jnp.float32),
            jax.ShapeDtypeStruct(prev_shape, jnp.float32),
            boolv, key_aval,
            jax.tree.map(aval, pyr), jax.tree.map(aval, opt),
            key_aval, f32, f32, cmask_avals, smask_avals, tag_aval,
        )
        key = (i, n, prev_shape)
        t0 = time.perf_counter()
        try:
            lo = run_scale.trace(*args, mesh=None).lower()
        except Exception:  # pragma: no cover - belt and braces
            continue
        timings[key] = {"lower": time.perf_counter() - t0}
        # one throwaway per program signature per process: repeat
        # stylizations (bench's measured run, serving loops) must not
        # re-pay the throwaway's device work on already-loaded programs
        dyn_avals = None
        if preload and _preload_enabled():
            # cfg.pyramid_levels shapes the pyr/opt avals — two configs
            # differing only in it are distinct compiled programs and must
            # not collide in _PRELOADED (the second would silently skip
            # its preload and pay the load on its first real call)
            sig = (spec, key, mode, chw, shw, cfg.pyramid_levels,
                   tuple(content_shape), tuple(style_shape),
                   None if cmask_avals is None else cmask_avals.shape,
                   None if smask_avals is None else smask_avals.shape)
            with _PRELOADED_LOCK:
                if sig not in _PRELOADED:
                    _PRELOADED.add(sig)
                    dyn_avals = args[6:]
        futs[key] = ex.submit(compile_one, key, lo, dyn_avals)
    ex.shutdown(wait=False)
    return PrecompiledPrograms(futs, timings)


def stylize_single(
    content: jnp.ndarray,
    style: jnp.ndarray,
    cfg: StrotssConfig,
    vgg_params,
    content_masks: Optional[jnp.ndarray] = None,
    style_masks: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    progress_cb: Optional[Callable[[int, int, int, Dict[str, float]], None]] = None,
    snapshot_cb: Optional[Callable[[int, int, jnp.ndarray], None]] = None,
    mesh=None,
    init_image: Optional[jnp.ndarray] = None,
    style_weights=None,
) -> Tuple[jnp.ndarray, Dict]:
    """Full coarse-to-fine stylization of one (content, style) pair.

    ``content``/``style``: (1,H,W,3) float [0,1]. Masks, if given, are
    (K,H,W,1) float region indicators (see ``strotss_tpu.ops.masks``).
    Returns (uint8 HWC image, info dict with per-scale losses/timings and
    the full per-step loss curve). ``progress_cb`` is invoked once per
    optimization step (replayed from each chunk's metric block), matching
    the reference's per-iteration display (``run_strotss.py:148-152``).
    With ``cfg.shard_samples`` and a ``mesh`` holding a 'sample' axis, the
    transport losses are partitioned over that axis (see _step_losses);
    with ``cfg.shard_spatial`` and a 'spatial' axis, the conv stack is
    spatially partitioned across chips (see _shard_spatial_constraint).

    ``init_image``: optional (1,H,W,3) float [0,1] warm start. The first
    scale then seeds from ``resize(init) + content Laplacian`` (the same
    "mid" rule every later scale uses for its predecessor,
    ``run_strotss.py:80-84``) instead of the reference's cold seed of
    ``content Laplacian + mean style color`` (``run_strotss.py:76-79``).
    Use cases: refining a finished stylization with more steps, and
    frame-to-frame coherent video stylization (init frame t with frame
    t-1's output). TPU-native extension — the reference has no analogue.

    ``style`` may also be a LIST/TUPLE of style images (each (1,H,W,3),
    any shapes) with ``style_weights`` (same length, >= 0, positive sum):
    multi-style blending. The style target becomes a weighted mixture —
    ``style_sample_counts(weights, sample_size)`` full-grid samples drawn
    from each style's own hypercolumn and concatenated — and the first
    scale seeds from the weight-blended mean style color. Styles whose
    apportioned count is 0 are dropped on host, so ``weights=[1, 0]``
    reduces BIT-EXACTLY to the single-style run. Incompatible with region
    masks (a mask pairs ONE content region with ONE style region).
    TPU-native extension — the reference has no analogue.
    """
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    key = normalize_key(key)
    multi = isinstance(style, (list, tuple))
    style_ns: Optional[Tuple[int, ...]] = None
    style_w_t = None
    if multi:
        styles = list(style)
        if len(styles) == 0:
            raise ValueError("style list must not be empty")
        if style_weights is None:
            style_weights = [1.0] * len(styles)
        if len(style_weights) != len(styles):
            raise ValueError(
                f"style_weights has {len(style_weights)} entries for "
                f"{len(styles)} styles — one weight per style"
            )
        if content_masks is not None or style_masks is not None:
            raise ValueError(
                "multi-style blending is incompatible with region masks — "
                "each mask color pairs one content region with ONE style "
                "region (run_strotss.py:97-125); pass a single style"
            )
        counts = style_sample_counts(style_weights, cfg.sample_size)
        keep = [i for i, n in enumerate(counts) if n > 0]
        styles = [styles[i] for i in keep]
        if len(styles) == 1:
            # zero-count styles dropped; a single survivor takes the
            # single-style path exactly (same programs, same key stream)
            style, multi = styles[0], False
        else:
            style = tuple(styles)
            style_ns = tuple(counts[i] for i in keep)
            style_w_t = jnp.asarray(
                [float(style_weights[i]) for i in keep], jnp.float32
            )
    elif style_weights is not None:
        raise ValueError(
            "style_weights was given with a single style image — pass a "
            "list of styles to blend, or drop the weights"
        )
    # cap (not resize_max) at the library boundary: CLI/serve inputs were
    # already resized at load time, and resize_max is not idempotent — a
    # second application can shift the shape by one pixel and resample the
    # image again (see ops/image.cap_max). Raw library inputs larger than
    # the cap are downscaled exactly like the reference's load-time resize.
    content = cap_max(content, cfg.max_size)
    if multi:
        style = tuple(cap_max(s, cfg.max_size) for s in style)
    else:
        style = cap_max(style, cfg.max_size)
    from strotss_tpu.validation import check_start_level

    check_start_level(cfg)
    warm = init_image is not None
    if warm:
        # ONE direct resize to the first executed scale's resolution —
        # the exact resample a full run's scale handoff performs on its
        # predecessor (resize(prev, chw), _scale_seed "mid"/"last"), so a
        # refine seeded with info["stylized"] reproduces the full run's
        # tail for ANY content shape and start_level (a detour through
        # the full-res shape would compose two bilinear resamples and
        # silently deviate). The warm first-scale program's ``prev`` aval
        # is this chw shape — still one program variant per shape bucket.
        init_image = resize_bilinear(
            init_image, warm_init_hw(content.shape[1], content.shape[2], cfg)
        )
    use_mask = content_masks is not None
    spec = spec_from_config(cfg, masked=use_mask)

    if snapshot_cb is not None and cfg.save_every > 0 and cfg.max_iter > 0:
        # snapshots can only fire at chunk boundaries (the image exists
        # only between compiled chunks) — pick the coarsest chunk size at
        # which every save_every multiple IS a boundary. gcd keeps chunk
        # sizes uniform (one compiled program size per scale, plus at most
        # a remainder), so e.g. save_every=50 under the default
        # log_every=200 runs 4 x 50-step chunks instead of silently
        # snapshotting once at step 200.
        import math

        cadence = math.gcd(
            max(1, min(cfg.log_every, cfg.max_iter)),
            min(cfg.save_every, cfg.max_iter),
        )
        if cadence != cfg.log_every:
            import dataclasses

            cfg = dataclasses.replace(cfg, log_every=cadence)

    if spec.shard_spatial and (
        mesh is None or "spatial" not in mesh.axis_names
    ):
        raise ValueError(
            "cfg.shard_spatial needs a mesh with a 'spatial' axis — pass "
            "stylize(..., mesh=make_mesh((N,), ('spatial',)))"
        )
    if spec.shard_samples and (
        mesh is None or "sample" not in mesh.axis_names
    ):
        # same upfront contract as shard_spatial: a silent single-device
        # no-op (mesh=None) or an opaque NamedSharding error deep inside
        # the trace (missing axis) would both betray the explicit request
        raise ValueError(
            "cfg.shard_samples needs a mesh with a 'sample' axis — pass "
            "stylize(..., mesh=make_mesh((N,), ('sample',)))"
        )
    if (spec.shard_samples or spec.shard_spatial) and mesh is not None:
        # place every input on the mesh's devices (replicated); the
        # 'sample'-axis constraints inside the step then partition the
        # transport losses without a device-assignment clash
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        put = lambda t: jax.tree.map(  # noqa: E731
            lambda a: jax.device_put(a, rep), t
        )
        content, style, vgg_params = put(content), put(style), put(vgg_params)
        if use_mask:
            content_masks, style_masks = put(content_masks), put(style_masks)
        if warm:
            init_image = put(init_image)

    from strotss_tpu.utils import checkpoint as ckpt

    fingerprint = {
        "lr": cfg.lr,
        "levels": cfg.levels,
        "max_iter": cfg.max_iter,
        "alpha": cfg.alpha,
        "pyramid_levels": cfg.pyramid_levels,
        "seed": cfg.seed,
        "spec": [list(v) if isinstance(v, tuple) else v for v in spec],
        "content_shape": list(content.shape),
        "style_shape": (
            [list(s.shape) for s in style] if multi else list(style.shape)
        ),
        "n_regions": int(content_masks.shape[0]) if use_mask else 0,
    }
    if multi:
        # blended runs can't resume cold-run checkpoints (different style
        # target) — the weights/counts make the mismatch an error
        fingerprint["style_weights"] = [float(w) for w in style_w_t]
        fingerprint["style_ns"] = list(style_ns)
    if warm:
        # only present for warm-start runs: cold-run fingerprints stay
        # byte-identical to pre-feature checkpoints. A cold checkpoint
        # resumed under a different scale-0 seed would silently continue
        # the wrong trajectory — the fingerprint check makes it an error.
        fingerprint["warm_start"] = True
    if cfg.start_level:
        fingerprint["start_level"] = cfg.start_level  # same contract
    resume = ckpt.load_meta(cfg.checkpoint_dir)
    if resume is not None:
        ckpt.check_fingerprint(resume, fingerprint, cfg.checkpoint_dir)
        if resume["scale_index"] >= cfg.levels:
            raise ValueError(
                f"Checkpoint scale_index {resume['scale_index']} is out of "
                f"range for levels={cfg.levels} — config mismatch with the "
                "saved run. Delete the checkpoint directory to start fresh."
            )

    programs: Dict = {}
    precompile_seconds = 0.0
    t_pre = time.perf_counter()
    # gate on the same condition the consumer loop uses (sharded runs
    # never call the AOT programs — precompiling them would pay the full
    # relay compile cost twice)
    if cfg.precompile and not multi and not spec.shard_samples \
            and not spec.shard_spatial:
        # multi-style runs compile on demand through run_scale (the AOT
        # signature builder is single-style; blending is an interactive
        # feature, not the serving hot path)
        programs = precompile_scales(
            cfg, spec, vgg_params, content.shape, style.shape,
            content_masks, style_masks,
            # resume-aware: compile only the programs this run will call —
            # completed scales' programs would waste 20-120 s/program of
            # relay compile AND leave unconsumed futures in flight at the
            # end-of-run metric fetch (a documented minutes-long stall).
            # start_level skips coarse scales the same way.
            resume_scale=max(cfg.start_level,
                             resume["scale_index"] if resume else 0),
            resume_done=(
                min(resume["done_steps"], cfg.max_iter) if resume else 0
            ),
            warm_start=warm,
            content=content,
            style=style,
            preload=True,
        )
        # lowering is serial on this thread; the compile RPCs it submitted
        # are still in flight (threaded) — this phase is ~sum(lower)
        precompile_seconds = time.perf_counter() - t_pre

    alpha = cfg.initial_alpha()
    # warm start: the init image plays scale 0's "previous stylization"
    stylized = init_image if warm else None
    final_u8 = None
    info: Dict = {"scales": []}
    t_total = time.perf_counter()

    for i, scl in enumerate(cfg.scale_sizes()):
        t_scale = time.perf_counter()
        key, k_style, k_run = jax.random.split(jax.random.fold_in(key, i), 3)

        if i < cfg.start_level:
            # refinement mode skips the coarse scales entirely; alpha
            # still halves so each executed scale sees exactly the alpha
            # a full run would give it (run_strotss.py:158)
            alpha /= 2.0
            continue
        if resume is not None and i < resume["scale_index"]:
            # this scale completed in the interrupted run; only its final
            # pyramid matters, and that lives in the checkpointed scale —
            # skip all per-scale setup/compute for it.
            alpha /= 2.0
            continue

        # init rules, run_strotss.py:74-89
        chw = resize_max_hw(content.shape[1], content.shape[2], scl)
        if multi:
            shw = tuple(
                resize_max_hw(s.shape[1], s.shape[2], scl) for s in style
            )
        else:
            shw = resize_max_hw(style.shape[1], style.shape[2], scl)
        mode = "first" if i == 0 else ("mid" if i < cfg.levels - 1 else "last")
        if i == 0 and warm:
            mode = "mid"  # seed from init_image (see _scale_signatures)
        lr = cfg.lr / 2 if (i == cfg.levels - 1 and i > 0) else cfg.lr
        lr_t = jnp.asarray(lr, jnp.float32)
        prev = stylized if stylized is not None else content

        # first chunk consumes host zero templates under is_first
        pyramid, opt_state = scale_state_templates(chw, cfg.pyramid_levels, lr)

        done = 0
        is_first = True
        if resume is not None and i == resume["scale_index"]:
            pyramid, opt_state, k_run = ckpt.restore_state(
                cfg.checkpoint_dir, (pyramid, opt_state, k_run)
            )
            alpha = resume["alpha"]
            done = min(resume["done_steps"], cfg.max_iter)
            resume = None
            is_first = False

        alpha_t = jnp.asarray(alpha, jnp.float32)

        last: Dict[str, float] = {}
        curve: List[np.ndarray] = []
        img_u8 = None
        for n in chunk_plan(cfg.max_iter - done, cfg.log_every):
            # strongly-typed scalar so the aval matches the AOT signature
            is_first_t = jnp.asarray(is_first, jnp.bool_)
            prog_key = (i, n, tuple(prev.shape))
            prog = programs.get(prog_key)
            if prog is not None and not spec.shard_samples \
                    and not spec.shard_spatial:
                timing = getattr(programs, "timings", {}).get(prog_key)
                t_call = time.perf_counter()
                pyramid, opt_state, k_run, metrics, stylized, img_u8 = prog(
                    vgg_params, content, style, prev, is_first_t, k_style,
                    pyramid, opt_state, k_run, alpha_t, lr_t,
                    content_masks, style_masks, source_tag(),
                )
                if timing is not None and "first_call" not in timing:
                    # first execution includes the one-time remote program
                    # load on this backend — block so it's attributable.
                    # Caveat: axon's block_until_ready can return before
                    # the program load completes (only device_get truly
                    # waits), so first_call is a LOWER bound; the residue
                    # lands in the scale's "seconds". A device_get here
                    # would be exact but stalls minutes when later scales'
                    # compile RPCs are still in flight (the stall the
                    # deferred-fetch logic below exists to avoid) — a
                    # worse trade than an under-reported timing field.
                    jax.block_until_ready(metrics)
                    timing["first_call"] = time.perf_counter() - t_call
            else:
                pyramid, opt_state, k_run, metrics, stylized, img_u8 = (
                    run_scale(
                        spec, n, mode, chw, shw, cfg.pyramid_levels,
                        vgg_params, content, style, prev, is_first_t,
                        k_style, pyramid, opt_state, k_run, alpha_t, lr_t,
                        content_masks, style_masks, source_tag(),
                        mesh=mesh if (spec.shard_samples
                                  or spec.shard_spatial) else None,
                        style_weights=style_w_t, style_ns=style_ns,
                    )
                )
            is_first = False
            if cfg.checkpoint_dir:
                ckpt.save_state(
                    cfg.checkpoint_dir, i, done + n, alpha,
                    pyramid, opt_state, k_run, fingerprint=fingerprint,
                    extras={"stylized": stylized, "image_u8": img_u8},
                )
            # When no per-chunk consumer needs the values now (callbacks/
            # checkpoints), keep the metric blocks on device and fetch once
            # after the final scale. This serves two ends on this backend:
            # (a) host transfers stall (minutes!) while compile RPCs are in
            # flight — the fetch must wait for compiles to settle anyway;
            # (b) in steady state it PIPELINES the scales: without a
            # per-chunk device_get the host races ahead and dispatches the
            # next scale's program (~30 ms/call through the tunnel) while
            # the device is still executing this one, hiding the per-scale
            # dispatch latency entirely (measured ~0.3 s over 4 scales).
            # Per-scale "seconds" become dispatch times in this mode; the
            # end-to-end total (info["seconds"], measured after the final
            # fetch) stays honest.
            defer = (
                progress_cb is None
                and snapshot_cb is None
                and not cfg.checkpoint_dir
            )
            if defer:
                curve.append(metrics)  # device array; fetched after the run
            else:
                mblock = np.asarray(jax.device_get(metrics))  # (n, 3)
                curve.append(mblock)
                if progress_cb is not None:
                    for j in range(n):
                        progress_cb(
                            scl, done + j + 1, cfg.max_iter,
                            {"loss": float(mblock[j, 0]),
                             "loss_c": float(mblock[j, 1]),
                             "loss_s": float(mblock[j, 2])},
                        )
                last = {"loss": float(mblock[-1, 0]),
                        "loss_c": float(mblock[-1, 1]),
                        "loss_s": float(mblock[-1, 2])}
            done += n
            if (
                snapshot_cb is not None
                and cfg.save_every > 0
                and (done % cfg.save_every == 0 or done == cfg.max_iter)
            ):
                snapshot_cb(scl, done, img_u8)

        if img_u8 is None:
            # zero steps ran (resume at a completed chunk boundary): reuse
            # the image arrays the interrupted run saved with the state —
            # re-deriving them through a different XLA program can round the
            # odd pixel differently and break bit-exact resume downstream
            saved = ckpt.restore_extras(cfg.checkpoint_dir) \
                if cfg.checkpoint_dir else {}
            if "stylized" in saved and "image_u8" in saved:
                stylized = jnp.asarray(saved["stylized"])
                img_u8 = jnp.asarray(saved["image_u8"])
            else:
                # is_first matters here: a fresh run with max_iter=0 must
                # still consume the seeded init (is_first=True), not the
                # all-zero state templates
                pyramid, opt_state, k_run, _, stylized, img_u8 = run_scale(
                    spec, 0, mode, chw, shw, cfg.pyramid_levels, vgg_params,
                    content, style, prev, jnp.asarray(is_first, jnp.bool_),
                    k_style,
                    pyramid, opt_state, k_run, alpha_t, lr_t,
                    content_masks, style_masks, source_tag(),
                    mesh=mesh if (spec.shard_samples
                                  or spec.shard_spatial) else None,
                    style_weights=style_w_t, style_ns=style_ns,
                )
        deferred = any(not isinstance(c, np.ndarray) for c in curve)
        if not deferred:
            # device sync so per-scale seconds are honest; skipped in the
            # deferred case — syncing there would (a) stall minutes while
            # compile RPCs are in flight and (b) forfeit the scale
            # pipelining the deferred fetch exists to enable
            jax.block_until_ready(stylized)
        final_u8 = img_u8
        info["scales"].append(
            {
                "scale": scl,
                "alpha": alpha,
                "seconds": time.perf_counter() - t_scale,
                "curve": curve,
                **last,
            }
        )
        alpha /= 2.0

    # settle deferred metric fetches. The loop above normally consumed
    # every program future, but join any straggler explicitly (signature
    # drift, failed compile) — a device_get with a compile RPC still in
    # flight stalls for minutes on this backend.
    t_fetch = time.perf_counter()
    if hasattr(programs, "wait_all"):
        programs.wait_all()
    for s in info["scales"]:
        cv = [np.asarray(jax.device_get(c)) for c in s["curve"]]
        s["curve"] = (
            np.concatenate(cv, axis=0) if cv else np.zeros((0, 3), np.float32)
        )
        if "loss" not in s and len(s["curve"]):
            s["loss"] = float(s["curve"][-1, 0])
            s["loss_c"] = float(s["curve"][-1, 1])
            s["loss_s"] = float(s["curve"][-1, 2])

    # phase attribution for slow warmups (VERDICT r3 next-round 1a):
    # precompile_seconds = serial lowering (before the scale loop — NOT
    # part of info["seconds"]); dispatch_seconds = the scale loop (incl.
    # per-program compile-future waits and the first_call lower-bound
    # blocks); fetch_seconds = last dispatch -> final device_get, where
    # this backend's one-time remote program loads surface (its
    # block_until_ready returns before loads complete; only device_get
    # truly waits). bench.py prints all three.
    info["precompile_seconds"] = precompile_seconds
    info["dispatch_seconds"] = t_fetch - t_total
    info["fetch_seconds"] = time.perf_counter() - t_fetch
    info["seconds"] = time.perf_counter() - t_total
    # the final FLOAT stylization (pre-postprocess): postprocess min-max
    # renormalizes before quantizing, so chaining through the uint8 image
    # perturbs the next run's seed — feed this back as ``init_image`` for
    # exact refinement/video chains instead
    info["stylized"] = stylized
    timings = getattr(programs, "timings", None)
    if timings:
        # per-program lower/compile/first-call seconds, so a slow warmup
        # is attributable (VERDICT r2 next-round 1a); bench.py prints these
        info["programs"] = {
            f"scale{k[0]}_n{k[1]}": {m: round(v, 2) for m, v in t.items()}
            for k, t in timings.items()
        }
    return final_u8, info
