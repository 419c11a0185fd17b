"""Batched stylization: vmap over (content, style) pairs + mesh sharding.

The reference is hard-wired to batch 1 (``/root/reference/nn/utils.py:55-65``
adds/asserts the singleton batch dim). Stylizations are independent, so the
TPU-native scaling story is: stack B pairs, vmap the per-scale train step
over the pair axis, and shard that axis over the mesh's ``data`` axis —
XLA then runs B independent VGG/loss pipelines with zero per-step
communication (losses are per-pair; no cross-pair reduction exists).

Composition (round-2 capabilities):

- **masked x batched**: per-pair region mask stacks (B, K, H, W, 1) padded
  to a common K with ``region_valid`` (B, K) 0/1 weights — the masked train
  step of ``run_strotss.py:97-125`` vmapped over pairs, loss averaged over
  each pair's *valid* regions only (SURVEY.md §7.7-7.8 static-shape plan).
- **checkpoint/resume**: same chunk-boundary fingerprinted checkpoints as
  the single-pair solver.
- **2-D ('data','sample') meshes**: with ``cfg.shard_samples`` the sampled
  feature matrices additionally get 'sample'-axis sharding constraints, so
  each pair's N² transport losses are partitioned over the sample axis
  while pairs spread over 'data' (GSPMD inserts the collectives).
- **per-pair alpha + keys** (round 4): ``alphas=(B,)`` style strengths and
  ``pair_keys=(B,)`` base PRNG keys ride the pair axis — heterogeneous
  jobs batch in ONE program (alpha only enters the loss scalarization),
  and a job keyed by its own seed gets the same trajectory batched or
  single, at any batch position (scheduler-invariant serving).

All images in a batch share one shape bucket (pad/resize on the host
first). The chunk runner is one module-level jit (static spec + mesh), so
repeated batches of the same bucket reuse the compile cache.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from strotss_tpu.config import StrotssConfig
from strotss_tpu.models.weights import load_vgg_params
from strotss_tpu.ops.image import fold_laplacian_pyramid, postprocess
from strotss_tpu.ops.sampling import prepare_mask, sample_style
from strotss_tpu.solve import (
    StepSpec,
    _scale_seed,
    _step_losses,
    chunk_plan,
    extract_for_grad,
    extract_hypercolumn,
    make_optimizer,
    resize_max_hw,
    source_tag,
    spec_from_config,
    style_target_moments as solve_style_moments,
    warm_init_hw,
)


def _constrain(tree, mesh: Optional[Mesh], spec: P):
    if mesh is None:
        return tree
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec)),
        tree,
    )


@partial(
    jax.jit,
    static_argnames=("spec", "mode", "chw", "shw", "levels", "mesh"),
)
def prepare_scale_batch(
    spec: StepSpec,
    mode: str,
    chw,
    shw,
    levels: int,
    mesh: Optional[Mesh],
    vgg_params,
    contents,
    styles,
    prev,
    k_style,
    lr,
    content_masks=None,
    style_masks=None,
):
    """Batched analogue of ``solve.prepare_scale``: the whole per-scale
    setup (resize, pyramid seed, both VGG extractions, style targets, mask
    prep, optimizer init) as ONE jitted program, vmapped over the pair axis
    and sharded over the mesh's 'data' axis. ``k_style``: (B, 2) per-pair
    style keys — each pair's target sampling uses exactly the key stream
    ``stylize_single`` would (per-pair equivalence)."""
    contents = _constrain(contents, mesh, P("data"))
    styles = _constrain(styles, mesh, P("data"))

    scl_c, scl_s, pyramid = _scale_seed(
        mode, chw, shw, levels, contents, styles, prev
    )
    pyramid = _constrain(pyramid, mesh, P("data"))
    content_feats = extract_hypercolumn(spec, vgg_params, scl_c)
    style_feats = extract_hypercolumn(spec, vgg_params, scl_s)
    content_feats = _constrain(content_feats, mesh, P("data"))
    style_feats = _constrain(style_feats, mesh, P("data"))

    if style_masks is not None:
        # (B, K, H, W, 1) -> per-pair (K, h, w) validity maps at scale res
        smasks = jax.vmap(
            jax.vmap(lambda m: prepare_mask(m, shw))
        )(style_masks)

        def pair_targets(feats, masks, k):
            kk = jax.random.split(k, masks.shape[0])
            return jax.vmap(
                lambda m, k1: sample_style(k1, feats, spec.sample_size, m)
            )(masks, kk)

        style_targets = jax.vmap(pair_targets)(style_feats, smasks, k_style)
    else:
        style_targets = jax.vmap(
            lambda f, k: sample_style(k, f, spec.sample_size)
        )(style_feats, k_style)
    style_targets = _constrain(style_targets, mesh, P("data"))

    cmasks = None
    if content_masks is not None:
        cmasks = jax.vmap(
            jax.vmap(lambda m: prepare_mask(m, chw))
        )(content_masks)
        cmasks = _constrain(cmasks, mesh, P("data"))

    opt_state = make_optimizer(lr).init(pyramid)
    return pyramid, content_feats, style_targets, cmasks, opt_state


@partial(
    jax.jit,
    static_argnames=("spec", "n_steps", "mesh"),
    donate_argnames=("pyramid", "opt_state", "key"),
)
def run_chunk_batch(
    spec: StepSpec,
    n_steps: int,
    mesh: Optional[Mesh],
    vgg_params,
    content_feats,
    style_targets,
    content_masks,
    region_valid,
    pyramid,
    opt_state,
    key,
    alpha,
    lr,
    src_tag=None,
):
    """``n_steps`` steps of the batched optimization as one on-device scan.

    Per-pair losses come from ``solve._step_losses`` (the exact single-pair
    step semantics: masked region vmap, validity weights, optional
    'sample'-axis sharding constraints), vmapped over the pair axis.
    Returns per-step (n, B, 3) metrics plus the folded images and their
    uint8 postprocess (no extra compiled programs per scale).

    **Per-pair exactness contract**: the total loss is the SUM of per-pair
    losses — pairs are independent (no cross-pair op exists), so each
    pair's gradient is exactly its single-run gradient; a mean would scale
    grads by 1/B, which RMSprop's ε=1e-8 turns into an effective ε·B²
    inflation that suppresses early/small-gradient updates vs B single
    runs. ``key`` is a (B, 2) stack of per-pair keys, each split per step
    exactly like ``solve.run_chunk``'s single key — so pair b's trajectory
    is bit-for-bit the trajectory of a single run seeded with ``key[b]``
    (tests/test_parallel.py::test_batched_matches_single_runs). ``alpha``
    is a (B,) per-pair stack for the same reason: it only enters the loss
    scalarization (``α·L_c + L_s`` weighting, palette weight, denom), so
    pair b optimizes under exactly ``alpha[b]`` — heterogeneous style
    strengths batch together in ONE program (uniform batches pass a
    broadcast vector; same program either way). Reference semantics: B
    independent ``run()`` calls (``run_strotss.py:43-161``).
    """
    opt = make_optimizer(lr)
    style_moments = jax.vmap(
        lambda t: solve_style_moments(
            spec, t, masked=content_masks is not None
        )
    )(style_targets)

    def per_pair(cf, pf, target, tmom, cmask, valid, a, k):
        loss, (lc, ls) = _step_losses(
            spec, cf, pf, target, cmask, a, k,
            region_valid=valid,
            mesh=mesh if spec.shard_samples else None,
            style_moments=tmom,
        )
        return loss, lc, ls

    def loss_fn(pyr, keys):
        img = fold_laplacian_pyramid(pyr)
        img = _constrain(img, mesh, P("data"))
        pred = extract_for_grad(spec, vgg_params, img)
        in_axes = (0, 0, 0, 0,
                   None if content_masks is None else 0,
                   None if region_valid is None else 0,
                   0, 0)
        losses, lcs, lss = jax.vmap(per_pair, in_axes=in_axes)(
            content_feats, pred, style_targets, style_moments,
            content_masks, region_valid, alpha, keys,
        )
        return jnp.sum(losses), jnp.stack([losses, lcs, lss], axis=-1)

    def step(carry, _):
        pyr, ostate, keys = carry
        # per-pair split, exactly run_chunk's `k, k_step = split(k)`
        splits = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
        keys, k_steps = splits[:, 0], splits[:, 1]
        (_, per_pair_metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(pyr, k_steps)
        updates, ostate = opt.update(grads, ostate)
        pyr = optax.apply_updates(pyr, updates)
        pyr = _constrain(pyr, mesh, P("data"))
        return (pyr, ostate, keys), per_pair_metrics

    (pyramid, opt_state, key), metrics = jax.lax.scan(
        step, (pyramid, opt_state, key), None, length=n_steps
    )
    if src_tag is not None:
        metrics = metrics + 0.0 * jnp.sum(src_tag)  # see solve.source_tag
    imgs = fold_laplacian_pyramid(pyramid)
    imgs_u8 = jax.vmap(lambda im: postprocess(im[None]))(imgs)
    return pyramid, opt_state, key, metrics, imgs, imgs_u8


def stylize_batch(
    contents: jnp.ndarray,
    styles: jnp.ndarray,
    cfg: Optional[StrotssConfig] = None,
    vgg_params=None,
    mesh: Optional[Mesh] = None,
    content_masks: Optional[jnp.ndarray] = None,
    style_masks: Optional[jnp.ndarray] = None,
    region_valid: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    progress_cb=None,
    init_images: Optional[jnp.ndarray] = None,
    alphas=None,
    pair_keys: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """Coarse-to-fine stylization of B pairs at once.

    ``contents``/``styles``: (B, H, W, 3) float [0,1], one shape bucket.
    ``content_masks``/``style_masks``: optional (B, K, H, W, 1) region
    stacks, padded to a common K with all-zero masks; ``region_valid``
    (B, K) marks real regions (defaults to all-valid). With ``mesh``, the
    pair axis is sharded over the mesh's ``data`` axis (and, under
    ``cfg.shard_samples``, transport losses over its ``sample`` axis).
    ``init_images``: optional (B, H, W, 3) warm starts — pair ``b``'s first
    scale seeds from ``init_images[b]`` exactly like
    ``stylize(init_image=...)`` (B parallel video streams advance one
    frame per batch at batched throughput). ``alphas``: optional (B,)
    per-pair style-strength values (the CLI-level ``--alpha``; each is
    rescaled like ``cfg.initial_alpha`` and halved per scale) — a batch
    can mix style strengths, or sweep one pair over B alphas in a single
    batched run. ``pair_keys``: optional (B,) stack of per-pair base PRNG
    keys (either flavor) replacing the ``fold_in`` derivation — pass each
    job's own key and a job's trajectory becomes independent of how the
    scheduler grouped it. Returns ((B,H',W',3) uint8, info).

    **Equivalence contract**: pair ``b``'s optimization trajectory equals a
    ``stylize_single`` run with ``key=pair_keys[b]`` (default:
    ``jax.random.fold_in(key, b)``) and ``cfg.alpha=alphas[b]`` to float
    tolerance — the batched loss is the per-pair SUM (exact per-pair
    grads), every pair carries its own key stream, and alpha enters only
    per-pair (see ``run_chunk_batch``).
    """
    from strotss_tpu.validation import check_image, check_masks

    check_image("contents", contents, batched=True)
    check_image("styles", styles, batched=True)
    if contents.shape[0] != styles.shape[0]:
        raise ValueError(
            f"contents and styles must have the same batch dim, got "
            f"{contents.shape[0]} vs {styles.shape[0]}"
        )
    if init_images is not None:
        check_image("init_images", init_images, batched=True)
        if init_images.shape[0] != contents.shape[0]:
            raise ValueError(
                f"init_images batch dim {init_images.shape[0]} does not "
                f"match the pair batch {contents.shape[0]}"
            )
    check_masks(content_masks, style_masks, region_valid, batched=True,
                batch=contents.shape[0])
    cfg = cfg or StrotssConfig()
    from strotss_tpu.validation import check_start_level

    check_start_level(cfg)
    if cfg.shard_spatial:
        raise ValueError(
            "shard_spatial is a single-pair scale-out feature (stylize); "
            "the batched path scales over the mesh's 'data' axis instead"
        )
    if cfg.shard_samples and (
        mesh is None or "sample" not in mesh.axis_names
    ):
        raise ValueError(
            "cfg.shard_samples needs a mesh with a 'sample' axis — pass "
            "stylize_batch(..., mesh=make_mesh((D, S), ('data', 'sample')))"
        )
    if mesh is not None and "data" not in mesh.axis_names:
        raise ValueError(
            "stylize_batch shards the pair axis over the mesh's 'data' "
            f"axis, but the given mesh has axes {mesh.axis_names} — build "
            "it with make_mesh((D,), ('data',)) (or ('data', 'sample'))"
        )
    if vgg_params is None:
        vgg_params = load_vgg_params(cfg.vgg_type, cfg.use_keras_weight)
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    from strotss_tpu.solve import normalize_key

    key = normalize_key(key)
    use_mask = content_masks is not None
    if use_mask and region_valid is None:
        region_valid = jnp.ones(content_masks.shape[:2], jnp.float32)
    spec = spec_from_config(cfg, masked=use_mask, batched=True)
    B = int(contents.shape[0])
    explicit_pair_keys = pair_keys is not None
    if pair_keys is None:
        # per-pair base keys: pair b's whole stream matches
        # stylize_single(key=fold_in(key, b))
        pair_keys = jax.vmap(lambda b: jax.random.fold_in(key, b))(
            jnp.arange(B)
        )
    else:
        pair_keys = jnp.stack([normalize_key(k) for k in pair_keys])
        # full-shape check, not just the batch dim: one raw (2,)-uint32
        # key passed where a LIST of per-pair keys belongs stacks to
        # shape (2,) — at B=2 a batch-dim-only check passes and the
        # mistake surfaces as an opaque trace-time shape error inside
        # fold_in instead of here at the API boundary
        if pair_keys.shape != (B, 2):
            raise ValueError(
                f"pair_keys must be {B} per-pair PRNG keys (stacked "
                f"shape ({B}, 2)); got {pair_keys.shape} — passing a "
                "single key instead of one key per pair is the usual "
                "cause"
            )
    if alphas is not None:
        alphas = np.asarray(alphas, np.float64)
        if alphas.shape != (B,):
            raise ValueError(
                f"alphas must be one value per pair, shape ({B},); got "
                f"{alphas.shape}"
            )
        if not np.all(np.isfinite(alphas)):
            raise ValueError("alphas must be finite")

    from strotss_tpu.ops.image import cap_max, resize_bilinear

    # cap, don't resize_max: serve/CLI inputs were already resized at load
    # time and resize_max is not idempotent (see ops/image.cap_max)
    contents = cap_max(contents, cfg.max_size)
    styles = cap_max(styles, cfg.max_size)
    warm = init_images is not None
    if warm:
        # ONE direct resize to the first executed scale's chw — the exact
        # resample a full run's scale handoff performs, so warm batched
        # chains keep the per-pair equivalence with warm single runs for
        # any content shape and start_level (see solve.warm_init_hw).
        # A no-op when the caller pre-resized to that shape (serve stacks
        # per-job inits at warm_init_hw — never at the content's shape,
        # which would compose two resamples and deviate from the single
        # path's one-resample contract).
        init_images = resize_bilinear(
            init_images,
            warm_init_hw(contents.shape[1], contents.shape[2], cfg),
        )

    def shard(x, pspec=P("data")):
        if mesh is None or x is None:
            return x
        return jax.device_put(x, NamedSharding(mesh, pspec))

    contents = shard(contents)
    styles = shard(styles)
    content_masks = shard(content_masks)
    style_masks = shard(style_masks)
    region_valid = shard(region_valid)
    init_images = shard(init_images)

    from strotss_tpu.utils import checkpoint as ckpt

    fingerprint = {
        "lr": cfg.lr,
        "levels": cfg.levels,
        "max_iter": cfg.max_iter,
        "alpha": cfg.alpha,
        "pyramid_levels": cfg.pyramid_levels,
        "seed": cfg.seed,
        "spec": [list(v) if isinstance(v, tuple) else v for v in spec],
        "content_shape": list(contents.shape),
        "style_shape": list(styles.shape),
        "n_regions": int(content_masks.shape[1]) if use_mask else 0,
    }
    if warm:
        # only on warm runs, so cold fingerprints match existing
        # checkpoints (same contract as stylize_single)
        fingerprint["warm_start"] = True
    if cfg.start_level:
        fingerprint["start_level"] = cfg.start_level  # same contract
    if alphas is not None:
        fingerprint["alphas"] = [float(a) for a in alphas]
    if explicit_pair_keys:
        # same reasoning as alphas: explicit per-pair keys steer every
        # scale's k_style/k_run — resuming a checkpointed batched run
        # with different pair_keys must be a fingerprint error, not a
        # silent trajectory divergence (the cfg.seed analogue already is)
        fingerprint["pair_keys"] = (
            np.asarray(pair_keys).astype(np.uint32).tolist()
        )
    resume = ckpt.load_meta(cfg.checkpoint_dir)
    if resume is not None:
        ckpt.check_fingerprint(resume, fingerprint, cfg.checkpoint_dir)
        if resume["scale_index"] >= cfg.levels:
            raise ValueError(
                f"Checkpoint scale_index {resume['scale_index']} out of "
                f"range for levels={cfg.levels}; delete the checkpoint "
                "directory to start fresh."
            )

    # per-pair alpha vector through the whole schedule (uniform batches
    # carry a broadcast of cfg.initial_alpha() — same program either way)
    if alphas is None:
        alpha = np.full(B, cfg.initial_alpha(), np.float64)
    else:
        alpha = np.asarray(
            [dataclasses.replace(cfg, alpha=float(a)).initial_alpha()
             for a in alphas], np.float64)
    # warm start: the inits play scale 0's "previous stylization"
    stylized = init_images if warm else None
    final_u8 = None
    info: Dict = {"scales": [], "batch": int(contents.shape[0])}
    t_total = time.perf_counter()

    for i, scl in enumerate(cfg.scale_sizes()):
        t_scale = time.perf_counter()
        # per-pair per-scale key derivation — identical to stylize_single's
        # `key, k_style, k_run = split(fold_in(key, i), 3)`, vmapped over b
        trip = jax.vmap(
            lambda k: jax.random.split(jax.random.fold_in(k, i), 3)
        )(pair_keys)
        pair_keys, k_style, k_run = trip[:, 0], trip[:, 1], trip[:, 2]

        if i < cfg.start_level:
            # refinement mode: skip coarse scales, keep the alpha halving
            # (see solve.stylize_single)
            alpha /= 2.0
            continue
        if resume is not None and i < resume["scale_index"]:
            alpha /= 2.0
            continue

        chw = resize_max_hw(contents.shape[1], contents.shape[2], scl)
        shw = resize_max_hw(styles.shape[1], styles.shape[2], scl)
        mode = "first" if i == 0 else ("mid" if i < cfg.levels - 1 else "last")
        if i == 0 and warm:
            mode = "mid"  # seed from init_images (see solve.stylize_single)
        lr = cfg.lr / 2 if (i == cfg.levels - 1 and i > 0) else cfg.lr
        lr_t = jnp.asarray(lr, jnp.float32)

        pyramid, content_feats, style_targets, cmasks, opt_state = (
            prepare_scale_batch(
                spec, mode, chw, shw, cfg.pyramid_levels, mesh, vgg_params,
                contents, styles,
                stylized if stylized is not None else contents,
                k_style, lr_t, content_masks, style_masks,
            )
        )

        done = 0
        if resume is not None and i == resume["scale_index"]:
            pyramid, opt_state, k_run = ckpt.restore_state(
                cfg.checkpoint_dir, (pyramid, opt_state, k_run)
            )
            # scalar in legacy/uniform checkpoints, per-pair list otherwise
            alpha = np.broadcast_to(
                np.asarray(resume["alpha"], np.float64), (B,)
            ).copy()
            done = min(resume["done_steps"], cfg.max_iter)
            resume = None

        alpha_t = jnp.asarray(alpha, jnp.float32)

        last: Dict[str, float] = {}
        curve: List[np.ndarray] = []
        imgs_u8 = None
        for n in chunk_plan(cfg.max_iter - done, cfg.log_every):
            pyramid, opt_state, k_run, metrics, stylized, imgs_u8 = (
                run_chunk_batch(
                    spec, n, mesh, vgg_params, content_feats, style_targets,
                    cmasks, region_valid, pyramid, opt_state, k_run,
                    alpha_t, lr_t, source_tag(),
                )
            )
            if cfg.checkpoint_dir:
                ckpt.save_state(
                    cfg.checkpoint_dir, i, done + n, alpha,
                    pyramid, opt_state, k_run, fingerprint=fingerprint,
                    extras={"stylized": stylized, "image_u8": imgs_u8},
                )
            # same defer-when-no-consumer gate as solve.stylize_single:
            # with no per-chunk consumer (callbacks/checkpoints), keep the
            # metric blocks on device and fetch once after the final scale
            # — scales pipeline on device, and the fetch never races a
            # compile RPC (a documented minutes-long stall on this
            # backend). Serve's per-pair losses are read from the
            # concatenated curve after the run, so serving batches get the
            # same pipelining (ADVICE r3 #2).
            defer = progress_cb is None and not cfg.checkpoint_dir
            if defer:
                curve.append(metrics)  # device array; fetched after the run
            else:
                mblock = np.asarray(jax.device_get(metrics))  # (n, B, 3)
                curve.append(mblock)
                batch_mean = mblock.mean(axis=1)  # (n, 3)
                if progress_cb is not None:
                    for j in range(n):
                        progress_cb(
                            scl, done + j + 1, cfg.max_iter,
                            {"loss": float(batch_mean[j, 0]),
                             "loss_c": float(batch_mean[j, 1]),
                             "loss_s": float(batch_mean[j, 2])},
                        )
                last = {"loss": float(batch_mean[-1, 0]),
                        "loss_c": float(batch_mean[-1, 1]),
                        "loss_s": float(batch_mean[-1, 2])}
            done += n

        if imgs_u8 is None:
            # zero steps ran (resume at a completed chunk boundary): reuse
            # the image arrays the interrupted run saved with the state —
            # re-deriving them through a different XLA program can round the
            # odd pixel differently and break bit-exact resume downstream
            saved = ckpt.restore_extras(cfg.checkpoint_dir) \
                if cfg.checkpoint_dir else {}
            if "stylized" in saved and "image_u8" in saved:
                stylized = jnp.asarray(saved["stylized"])
                imgs_u8 = jnp.asarray(saved["image_u8"])
            else:
                pyramid, opt_state, k_run, _, stylized, imgs_u8 = (
                    run_chunk_batch(
                        spec, 0, mesh, vgg_params, content_feats,
                        style_targets, cmasks, region_valid, pyramid,
                        opt_state, k_run, alpha_t, lr_t, source_tag(),
                    )
                )
        if not any(not isinstance(c, np.ndarray) for c in curve):
            # device sync so per-scale seconds are honest; skipped when
            # deferred — syncing would forfeit the scale pipelining (and
            # per-scale seconds become dispatch times, as in solve)
            jax.block_until_ready(stylized)
        final_u8 = imgs_u8
        info["scales"].append(
            {
                "scale": scl,
                # float for uniform batches (back-compat), per-pair list
                # under heterogeneous ``alphas``
                "alpha": (float(alpha[0]) if np.all(alpha == alpha[0])
                          else [float(a) for a in alpha]),
                "seconds": time.perf_counter() - t_scale,
                "curve": curve,
                **last,
            }
        )
        alpha /= 2.0

    # settle deferred metric fetches (one sync at the end of the run)
    for s in info["scales"]:
        cv = [np.asarray(jax.device_get(c)) for c in s["curve"]]
        s["curve"] = (
            np.concatenate(cv, axis=0) if cv
            else np.zeros((0, contents.shape[0], 3), np.float32)
        )
        if "loss" not in s and len(s["curve"]):
            bm = s["curve"].mean(axis=1)  # (n, 3) batch mean
            s["loss"] = float(bm[-1, 0])
            s["loss_c"] = float(bm[-1, 1])
            s["loss_s"] = float(bm[-1, 2])

    info["seconds"] = time.perf_counter() - t_total
    # final float stylizations (pre-postprocess) — feed back as
    # ``init_images`` for exact chains (see solve.stylize_single)
    info["stylized"] = stylized
    return final_u8, info
