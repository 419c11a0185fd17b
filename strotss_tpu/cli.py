"""CLI with the same surface as the reference's ``run_strotss.py``.

Flag names, defaults, positional args, and log messages mirror
``/root/reference/run_strotss.py:164-180``, with the reference's
``--level`` type bug fixed (it declared ``type=float``, which crashes
``range(level)`` whenever the flag is passed explicitly). ``--gpu_id``
becomes ``--device_id`` (TPU chip index) with the old spelling accepted as
an alias. TPU-specific additions: ``--compute_dtype``, ``--seed``,
``--log_every``, ``--no_pallas``, ``--sinkhorn``, ``--profile_dir``.
"""

from __future__ import annotations

import argparse
import os
import sys

from strotss_tpu.config import StrotssConfig
from strotss_tpu.utils.logging import make_logger
from strotss_tpu.utils.timing import Timer

logger = make_logger("STROTSS")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="strotss_tpu",
        description="TPU-native STROTSS style transfer",
    )
    parser.add_argument("content_path", type=str)
    parser.add_argument("style_path", type=str)
    parser.add_argument("--content_mask", type=str, default=None)
    parser.add_argument("--style_mask", type=str, default=None)
    parser.add_argument("--max_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=2e-3)
    parser.add_argument("--level", type=int, default=4)
    parser.add_argument("--max_iter", type=int, default=200)
    parser.add_argument("--alpha", type=float, default=1.0)
    parser.add_argument("--use_keras_weight", action="store_true")
    parser.add_argument("--gpu_id", "--device_id", type=int, default=0,
                        dest="device_id")
    parser.add_argument("--output_path", "-o", type=str, default="output.jpg")
    # TPU-native extensions
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--log_every", type=int, default=None,
        help="steps per compiled scan chunk (progress updates land at "
             "chunk boundaries). Default: 25 when stderr is a TTY — the "
             "bar moves ~8x per scale like the reference's per-step bar "
             "(run_strotss.py:145-152) — else max_iter (one chunk per "
             "scale, the fastest batch/driver setting)")
    parser.add_argument("--no_pallas", action="store_true")
    parser.add_argument("--no_precompile", action="store_true",
                        help="compile each scale lazily instead of AOT-"
                             "compiling all scales up front in parallel")
    parser.add_argument("--sinkhorn", action="store_true",
                        help="full entropic OT instead of relaxed EMD")
    parser.add_argument("--profile_dir", type=str, default=None)
    parser.add_argument("--save_every", type=int, default=0)
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="chunk-boundary checkpoints; resumes if present")
    parser.add_argument("--sample_size", type=int, default=1024,
                        help="feature samples per step (reference pins 1024)")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (the functional analogue "
                             "of the reference's determinism/sanitizer env)")
    parser.add_argument("--taps", type=str, default=None,
                        help="comma-separated VGG tap layers "
                             "(default: the 9 STROTSS taps)")
    parser.add_argument("--init", type=str, default=None,
                        help="warm-start image: the first scale seeds from "
                             "it (resized) instead of the cold content+"
                             "style-mean seed — refine a previous output, "
                             "or chain video frames for coherence")
    parser.add_argument("--remat", action="store_true",
                        help="recompute VGG activations in the backward "
                             "pass (jax.checkpoint): ~3x less activation "
                             "memory for ~1 extra forward — enables "
                             "resolutions past the single-chip ceiling")
    parser.add_argument("--style2", type=str, default=None,
                        help="second style image: blend two styles — the "
                             "style target mixes full-grid samples from "
                             "both in proportion to --style_blend")
    parser.add_argument("--style_blend", type=float, default=None,
                        help="weight of --style2 in [0,1] (style_path gets "
                             "1-w; default 0.5). 0 or 1 reduce exactly to "
                             "the single-style run of the surviving style. "
                             "Requires --style2")
    parser.add_argument("--styles", type=str, nargs="+", default=None,
                        help="additional style images beyond style_path: "
                             "blend N styles (generalizes --style2 and "
                             "mirrors serve's 'styles' job field). "
                             "Weights via --style_weights")
    parser.add_argument("--style_weights", type=float, nargs="+",
                        default=None,
                        help="one non-negative weight per style, positional "
                             "style_path first (len = 1 + len(--styles)); "
                             "relative, need not sum to 1; default equal. "
                             "0 drops a style exactly. Requires --styles")
    parser.add_argument("--start_level", type=int, default=0,
                        help="skip the coarsest N scales (alpha still "
                             "halves per skipped scale). With --init this "
                             "is a refinement pass: --level 4 "
                             "--start_level 3 --init out.jpg polishes an "
                             "existing result with extra 512px-only steps")
    return parser


def set_device(index: int = 0) -> None:
    """Pin one accelerator, analogous to the reference's ``set_gpu``
    (``nn/utils.py:73-85``): logs and falls back to CPU when none found."""
    import jax

    try:
        devices = [d for d in jax.devices() if d.platform != "cpu"]
    except RuntimeError as e:
        # a forced platform (JAX_PLATFORMS) that failed to initialize —
        # fall back to automatic backend selection rather than dying
        logger.warning(f"Backend init failed ({e}); auto-selecting backend.")
        jax.config.update("jax_platforms", "")
        devices = [d for d in jax.devices() if d.platform != "cpu"]
    if devices:
        if index >= len(devices):
            raise ValueError(f"Invalid device ID: {index}")
        # only pin when it differs from the process default: setting
        # jax_default_device changes the compilation-cache key, which
        # would make CLI runs recompile programs the library path cached
        if jax.devices()[0] != devices[index]:
            jax.config.update("jax_default_device", devices[index])
    else:
        logger.info("Accelerator not found. Using CPU.")


def enable_compile_cache() -> None:
    """Persistent XLA compile cache: repeat runs skip the one-time jit cost."""
    import jax

    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "strotss_tpu", "jaxcache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never a requirement
        pass


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    timer = Timer()
    timer.start()

    import jax

    enable_compile_cache()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from strotss_tpu.api import stylize
    from strotss_tpu.ops.masks import load_mask
    from strotss_tpu.utils.io import load_image, write_image

    set_device(args.device_id)

    if args.log_every is None:
        # interactive runs get a live bar (8 chunk updates per scale, a few
        # extra dispatches each — imperceptible at CLI timescales); piped /
        # driver runs keep the fastest one-chunk-per-scale setting. Chunk
        # size stays uniform so this costs no extra compiled programs.
        args.log_every = 25 if sys.stderr.isatty() else args.max_iter

    cfg = StrotssConfig(
        lr=args.lr,
        levels=args.level,
        max_iter=args.max_iter,
        alpha=args.alpha,
        max_size=args.max_size,
        sample_size=args.sample_size,
        use_keras_weight=args.use_keras_weight,
        compute_dtype=args.compute_dtype,
        seed=args.seed,
        log_every=args.log_every,
        use_pallas=not args.no_pallas,
        precompile=not args.no_precompile,
        use_sinkhorn=args.sinkhorn,
        profile_dir=args.profile_dir,
        save_every=args.save_every,
        checkpoint_dir=args.checkpoint_dir,
        taps=tuple(args.taps.split(",")) if args.taps else None,
        start_level=args.start_level,
        remat=args.remat,
    )

    # argument-consistency checks before any image I/O — a bad flag combo
    # must fail instantly, not after two multi-megapixel decodes
    if args.style_blend is not None and not args.style2:
        # a lone --style_blend would otherwise run a single-style job with
        # no hint that the blend was ignored (a typo'd --style2 path lands
        # in load_image's error instead, which is precise already)
        raise ValueError(
            "--style_blend requires --style2 (nothing to blend with)"
        )
    blend = 0.5 if args.style_blend is None else args.style_blend
    if args.style2 and not 0.0 <= blend <= 1.0:
        raise ValueError(
            f"--style_blend must be in [0, 1], got {blend}"
        )
    if args.styles and (args.style2 or args.style_blend is not None):
        raise ValueError(
            "--styles is mutually exclusive with --style2/--style_blend "
            "(fold the second style into --styles with --style_weights)"
        )
    if args.style_weights is not None and not args.styles:
        raise ValueError(
            "--style_weights requires --styles (nothing to weight)"
        )
    if args.styles and args.style_weights is not None \
            and len(args.style_weights) != 1 + len(args.styles):
        raise ValueError(
            f"--style_weights needs {1 + len(args.styles)} numbers "
            f"(style_path first, then the {len(args.styles)} --styles), "
            f"got {len(args.style_weights)}"
        )

    content = load_image(args.content_path, max_size=args.max_size)
    style = load_image(args.style_path, max_size=args.max_size)
    style_weights = None
    if args.style2:
        style2 = load_image(args.style2, max_size=args.max_size)
        style = [style, style2]
        style_weights = [1.0 - blend, blend]
        logger.info(
            f"Blending styles: {args.style_path} ({style_weights[0]:.2f}) + "
            f"{args.style2} ({style_weights[1]:.2f})."
        )
    elif args.styles:
        extras = [load_image(p, max_size=args.max_size) for p in args.styles]
        style = [style, *extras]
        # equal weights by default; bad weight VALUES (negative, all-zero)
        # fail downstream in style_sample_counts with precise messages
        style_weights = (list(args.style_weights)
                         if args.style_weights is not None
                         else [1.0] * len(style))
        names = [args.style_path, *args.styles]
        logger.info(
            "Blending styles: "
            + " + ".join(f"{p} ({w:g})"
                         for p, w in zip(names, style_weights)) + "."
        )
    init_image = None
    if args.init:
        init_image = load_image(args.init, max_size=args.max_size)
        logger.info(f"Warm-starting from {args.init}.")

    content_masks = style_masks = None
    if args.content_mask and args.style_mask:
        content_masks, style_masks = load_mask(
            args.content_mask, args.style_mask, max_size=args.max_size
        )
        logger.info(f"Loaded {content_masks.shape[0]} masks.")
    elif args.content_mask or args.style_mask:
        raise ValueError(
            "Either both content and style masks must be provided or neither."
        )

    try:
        from strotss_tpu.utils.io import is_jupyter_env

        if is_jupyter_env():  # notebook-aware bar, like run_strotss.py:15-18
            from tqdm.notebook import tqdm
        else:
            from tqdm import tqdm

        # skipped coarse scales never fire progress_cb
        bar = tqdm(total=(cfg.levels - cfg.start_level) * cfg.max_iter)
        prog = {"base": 0, "scl": None}

        def progress(scl, done, total, metrics):
            if prog["scl"] != scl:
                if prog["scl"] is not None:
                    prog["base"] += total
                prog["scl"] = scl
            bar.set_description(f"Scale: {scl:4d} - It: {done:4d}")
            bar.set_postfix({k: f"{v:.3f}" for k, v in metrics.items()})
            bar.n = prog["base"] + done
            bar.refresh()
    except ImportError:  # tqdm optional
        bar = None

        def progress(scl, done, total, metrics):
            logger.info(
                f"Scale: {scl:4d} - It: {done:4d}/{total} "
                + " ".join(f"{k}={v:.3f}" for k, v in metrics.items())
            )

    snapshot = None
    if cfg.save_every > 0:
        stem, ext = os.path.splitext(args.output_path)

        def snapshot(scl, it, img):
            write_image(img, f"{stem}_scale{scl}_it{it:04d}{ext or '.jpg'}")

    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)

    final, info = stylize(
        content,
        style,
        cfg,
        content_masks=content_masks,
        style_masks=style_masks,
        progress_cb=progress,
        snapshot_cb=snapshot,
        init_image=init_image,
        style_weights=style_weights,
    )

    if cfg.profile_dir:
        jax.profiler.stop_trace()
    if bar is not None:
        bar.close()

    timer.stop()
    logger.info(f"Done in {timer.elapsed_time:.2f}s.")
    write_image(final, args.output_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
