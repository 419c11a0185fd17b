"""Persistent serving loop: one process, many stylizations.

Single-shot CLI latency is dominated by one-time costs — program
compiles and the remote program load (tens of seconds through a
compile relay) — while the steady-state run is ~4.3 s/image on one
v5e. The per-scale programs are jit-cached in-process by shape
(``solve.run_scale``), so a long-lived serving process pays the
one-time costs on the first job of each shape bucket and then runs
every subsequent same-shaped job at steady state. This is the
deployment analogue of the reference's batch scripting around
``run_strotss.py`` (``/root/reference/run_strotss.py:164-180``), which
re-pays its tf.function retraces on every process start.

Job stream: JSON Lines — one job per line — from a file, or from stdin
(``--jobs -``) for queue-fed operation:

    {"content": "c.jpg", "style": "s.jpg", "output": "out.jpg"}

Optional per-job fields: ``content_mask``/``style_mask`` (paths, both
or neither), ``alpha``, ``seed``, ``init`` (a warm-start image path —
the first scale seeds from it; chain each video frame's job with
``"init": <previous frame's output>`` for frame-coherent stylization;
warm jobs batch with other warm jobs, so B interleaved video streams
advance one frame per batch at batched throughput), ``start_level``
(skip the coarsest N scales — with ``init`` this is a refinement pass
at the fine scales only), and — instead of ``style`` — ``styles`` (a
LIST of style paths) with optional ``style_weights`` (one number per
style): multi-style blending; the style target is a weighted mixture
(see ``solve.style_sample_counts``). Blend jobs run singly (each blend
is its own program signature), so they never stall a batched stream's
groups — they flush the pending group like any non-batchable job.
Shared knobs (resolution schedule, dtype, iterations, ...) come from
the CLI flags. One result line per
job streams to ``--results`` (default stdout) as soon as it finishes:

    {"output": "out.jpg", "ok": true, "seconds": 4.31, "loss": 0.021}

A failing job (missing file, bad mask pairing, corrupt image) emits
``{"ok": false, "error": ...}`` and the loop continues — a serving
process must not die on one bad job.

Batching: with ``--batch N`` consecutive unmasked jobs whose loaded
shapes match are grouped through ``stylize_batch`` (B pairs per
program; per-pair EXACT — each trajectory equals its single run, see
``parallel/batch.py``), which amortizes to ~3.75 s/image at B=8 on one
chip. Per-job ``alpha`` and ``seed`` ride the pair axis (one program
regardless), so heterogeneous style strengths/seeds batch at full
throughput — and because each pair's base key is the single path's
``PRNGKey(seed)``, a job's result is independent of whether the
scheduler batched it or where in the group it landed. Only masks and
``start_level`` opt a job out of batching. A full batch runs the
moment it fills; a batch that fails (one bad input) is retried
job-by-job so its good members still complete.

Warmup: ``--warmup HxW[:HxW]`` (repeatable; content[:style] on-disk
sizes) pays each shape bucket's one-time compile + remote program load
at deploy time by running a synthetic job through the exact serving
path before any real job is read.

Scale-out: ``--data_devices D`` shards batch groups across D devices
over a 1-D ``data`` mesh (pairs are independent, so the only
cross-device traffic is the initial ``device_put`` — the production
scaling axis on a pod slice; see ``parallel/mesh.py``). Requires
``--batch`` divisible by D; flush groups whose size isn't divisible by
D run unsharded. Fails fast when fewer than D accelerators exist
(``--allow_cpu_devices`` opts into virtual CPU devices for dev/test).

Shutdown: SIGTERM drains — an in-flight job finishes (no torn output
files), queued-but-unstarted jobs in the current batch group still run,
then the process exits 0; a SIGTERM while idle-blocked on stdin is
observed within the read poll interval (~0.25 s) and exits after the
drain. A second SIGTERM during the drain kills the process. A job line
consumed from the stream always gets exactly one result line — the
SIGTERM path cannot lose one (see ``_LineReader``).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time
from typing import Dict, List, Optional

from strotss_tpu.config import StrotssConfig
from strotss_tpu.utils.logging import make_logger

logger = make_logger("STROTSS")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="strotss_tpu.serve",
        description="TPU-native STROTSS serving loop (JSONL jobs in, "
                    "JSONL results out; compiled programs stay warm)",
    )
    parser.add_argument("--jobs", type=str, default="-",
                        help="JSONL job file, or '-' to stream from stdin")
    parser.add_argument("--results", type=str, default="-",
                        help="JSONL results file, or '-' for stdout")
    parser.add_argument("--batch", type=int, default=1,
                        help="group up to N consecutive same-shape unmasked "
                             "jobs into one per-pair-exact batched program")
    parser.add_argument("--data_devices", type=int, default=0,
                        help="shard batched groups across this many devices "
                             "over a 'data' mesh axis (pairs are "
                             "independent — the production scaling axis on "
                             "a pod slice). Requires --batch divisible by "
                             "it; flush groups whose size isn't divisible "
                             "run unsharded. 0 = off.")
    parser.add_argument("--allow_cpu_devices", action="store_true",
                        help="let --data_devices fall back to virtual CPU "
                             "devices when the accelerator count is too "
                             "small (dev/test only — never in production)")
    parser.add_argument("--warmup", action="append", default=[],
                        metavar="HxW[:HxW]",
                        help="pre-compile a shape bucket at startup by "
                             "running a synthetic job of this ON-DISK image "
                             "size through the exact serving path; "
                             "'HxW:HxW' gives content and style sizes "
                             "separately (one HxW uses it for both). May be "
                             "repeated; with --batch N the batched program "
                             "is warmed at group size N. Pays the one-time "
                             "compile + program-load at deploy time instead "
                             "of on the first real job.")
    # shared stylization knobs (same names/defaults as the main CLI)
    parser.add_argument("--max_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=2e-3)
    parser.add_argument("--level", type=int, default=4)
    parser.add_argument("--max_iter", type=int, default=200)
    parser.add_argument("--alpha", type=float, default=1.0)
    parser.add_argument("--use_keras_weight", action="store_true")
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no_pallas", action="store_true")
    parser.add_argument("--sinkhorn", action="store_true")
    parser.add_argument("--sample_size", type=int, default=1024)
    parser.add_argument("--taps", type=str, default=None)
    parser.add_argument("--start_level", type=int, default=0)
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--device_id", "--gpu_id", type=int, default=0,
                        dest="device_id")
    return parser


def _config(args, job: Dict) -> StrotssConfig:
    return StrotssConfig(
        lr=args.lr,
        levels=args.level,
        max_iter=args.max_iter,
        alpha=float(job.get("alpha", args.alpha)),
        max_size=args.max_size,
        sample_size=args.sample_size,
        use_keras_weight=args.use_keras_weight,
        compute_dtype=args.compute_dtype,
        seed=int(job.get("seed", args.seed)),
        start_level=int(job.get("start_level", args.start_level)),
        remat=args.remat,
        log_every=args.max_iter,  # one chunk per scale: fastest
        use_pallas=not args.no_pallas,
        precompile=False,  # rely on the in-process jit cache across jobs
        use_sinkhorn=args.sinkhorn,
        taps=tuple(args.taps.split(",")) if args.taps else None,
    )


def _load_job_inputs(args, job: Dict):
    from strotss_tpu.ops.masks import load_mask
    from strotss_tpu.utils.io import load_image

    for field in ("content", "output"):
        if field not in job:
            raise ValueError(f"job is missing required field '{field}'")
    if ("style" in job) == ("styles" in job):
        raise ValueError(
            "job needs exactly one of 'style' (a path) or 'styles' "
            "(a list of paths for multi-style blending)"
        )
    content = load_image(job["content"], max_size=args.max_size)
    if "styles" in job:
        paths = job["styles"]
        if not isinstance(paths, list) or not paths:
            raise ValueError("'styles' must be a non-empty list of paths")
        style = [load_image(p, max_size=args.max_size) for p in paths]
        weights = job.get("style_weights")
        if weights is not None and (
            not isinstance(weights, list) or len(weights) != len(paths)
        ):
            raise ValueError(
                f"'style_weights' must be a list of {len(paths)} numbers "
                "(one per style)"
            )
    else:
        if "style_weights" in job:
            raise ValueError(
                "'style_weights' requires 'styles' (a list) — a single "
                "'style' path has nothing to blend with"
            )
        style = load_image(job["style"], max_size=args.max_size)
        weights = None
    cmask = smask = None
    has_c, has_s = "content_mask" in job, "style_mask" in job
    if has_c != has_s:
        raise ValueError(
            "Either both content and style masks must be provided or neither."
        )
    if has_c:
        cmask, smask = load_mask(job["content_mask"], job["style_mask"],
                                 max_size=args.max_size)
    init = None
    if "init" in job:
        init = load_image(job["init"], max_size=args.max_size)
    return content, style, cmask, smask, init, weights


def _final_loss(info: Dict) -> Optional[float]:
    scales = info.get("scales") or []
    if scales and "loss" in scales[-1]:
        return float(scales[-1]["loss"])
    return None


def _run_single(args, job: Dict, vgg_params) -> Dict:
    from strotss_tpu.api import stylize
    from strotss_tpu.utils.io import write_image

    content, style, cmask, smask, init, weights = _load_job_inputs(args, job)
    t0 = time.perf_counter()
    img, info = stylize(content, style, _config(args, job),
                        content_masks=cmask, style_masks=smask,
                        vgg_params=vgg_params, init_image=init,
                        style_weights=weights)
    write_image(img, job["output"])
    out = {"output": job["output"], "ok": True,
           "seconds": round(time.perf_counter() - t0, 3)}
    loss = _final_loss(info)
    if loss is not None:
        out["loss"] = loss
    return out


def _batchable(job: Dict) -> bool:
    # batched pairs share one config; masks, program-shaping overrides
    # (start_level changes which scales run), and multi-style blends
    # (per-job style tuples/sample apportionments are distinct program
    # signatures) opt out. ``alpha`` and ``seed`` do NOT opt out: both
    # ride the pair axis (stylize_batch(alphas=..., pair_keys=...)), so
    # heterogeneous style-strength/seed jobs batch at full throughput.
    # Warm-start jobs batch with other warm jobs (the shape sig
    # keeps groups warm/cold homogeneous): B parallel video streams
    # advance one frame per batch at batched throughput. A chain WITHIN
    # one stream is kept sequential by the main loop's dependency flush
    # (a job whose init is a pending job's output never joins its
    # producer's group — see main); a dangling init (producer already
    # emitted, file missing) fails that group's load and the
    # retry-singly path runs the frames in order.
    return not any(k in job for k in
                   ("content_mask", "style_mask", "start_level",
                    "styles", "style_weights"))


def _run_batch(args, jobs: List[Dict], vgg_params, mesh=None) -> List[Dict]:
    import jax
    import jax.numpy as jnp

    from strotss_tpu.parallel.batch import stylize_batch
    from strotss_tpu.solve import normalize_key
    from strotss_tpu.utils.io import write_image

    contents, styles, inits = [], [], []
    for job in jobs:
        c, s, _, _, init, _ = _load_job_inputs(args, job)
        contents.append(c)
        styles.append(s)
        if init is not None:
            inits.append(init)
    # per-pair alpha/seed: each job runs under ITS OWN values inside the
    # one batched program, and each pair's base key is exactly the single
    # path's PRNGKey(seed) — a job's result is a pure function of the job
    # (content, style, config, seed), independent of whether the scheduler
    # batched it or where in the group it landed (scheduler invariance).
    alphas = [float(job.get("alpha", args.alpha)) for job in jobs]
    pair_keys = jnp.stack([
        normalize_key(jax.random.PRNGKey(int(job.get("seed", args.seed))))
        for job in jobs
    ])
    if inits and len(inits) != len(jobs):  # pragma: no cover - sig guard
        raise ValueError("warm and cold jobs cannot share a batch group")
    if inits:
        # per-job inits may differ in size; stack them at the first
        # executed scale's chw — the SAME single direct resample
        # stylize_single performs (solve.warm_init_hw), never a detour
        # through the content shape (that would compose two bilinear
        # resamples and silently deviate a chained video frame's batched
        # trajectory from its single-run trajectory whenever the init's
        # shape differs from the content's). stylize_batch's own resize
        # then no-ops on the already-matching shape.
        from strotss_tpu.ops.image import resize_bilinear
        from strotss_tpu.solve import warm_init_hw

        chw0 = warm_init_hw(contents[0].shape[1], contents[0].shape[2],
                            _config(args, {}))
        inits = [resize_bilinear(init, chw0) for init in inits]
    # NamedSharding needs the pair axis divisible by the mesh's data axis;
    # undersized groups (end-of-stream flushes) run unsharded
    if mesh is not None and len(jobs) % mesh.shape["data"] != 0:
        mesh = None
    t0 = time.perf_counter()
    # cfg from the CLI flags alone: the per-job knobs (alpha, seed) ride
    # the pair axis above, and non-batchable overrides never reach here
    imgs, info = stylize_batch(jnp.concatenate(contents),
                               jnp.concatenate(styles),
                               _config(args, {}), vgg_params=vgg_params,
                               mesh=mesh,
                               init_images=(jnp.concatenate(inits)
                                            if inits else None),
                               alphas=alphas, pair_keys=pair_keys)
    per = round((time.perf_counter() - t0) / len(jobs), 3)
    # final-scale curve is (n_steps, B, 3): per-pair final losses
    scales = info.get("scales") or []
    curve = scales[-1]["curve"] if scales else None
    results = []
    for b, job in enumerate(jobs):
        write_image(imgs[b], job["output"])
        result = {"output": job["output"], "ok": True,
                  "seconds": per, "batched": len(jobs)}
        if mesh is not None:
            result["data_devices"] = int(mesh.shape["data"])
        if curve is not None and len(curve):
            result["loss"] = float(curve[-1, b, 0])
        results.append(result)
    return results


def _data_mesh(args):
    """Build the 1-D 'data' mesh for ``--data_devices`` (None when off).

    Uses the default backend's devices and fails fast when there are
    fewer than requested — silently serving batches 10-100x slower on
    the wrong device class is worse than not starting. A dev box without
    a pod slice can opt into the virtual CPU devices explicitly with
    ``--allow_cpu_devices``."""
    if args.data_devices <= 0:
        return None
    if args.batch <= 1 or args.batch % args.data_devices != 0:
        raise ValueError(
            f"--data_devices {args.data_devices} requires --batch to be a "
            f"positive multiple of it (got --batch {args.batch})"
        )
    import jax

    from strotss_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    if len(devices) < args.data_devices:
        try:
            cpus = jax.devices("cpu")
        except RuntimeError:
            cpus = []
        if args.allow_cpu_devices and len(cpus) >= args.data_devices:
            logger.warning(
                f"Only {len(devices)} {devices[0].platform} device(s) "
                f"present; sharding over {args.data_devices} virtual CPU "
                "devices instead (--allow_cpu_devices)."
            )
            devices = cpus
        else:
            raise ValueError(
                f"--data_devices {args.data_devices} needs that many "
                f"devices, have {len(devices)} (and "
                f"{len(cpus)} CPU device(s); pass --allow_cpu_devices to "
                "use them for dev/testing)"
            )
    return make_mesh((args.data_devices,), ("data",), devices=devices)


def _warmup(args, vgg_params, mesh=None) -> None:
    """Run one synthetic job per ``--warmup HxW`` bucket through the real
    serving path (same loaders, same config, same jit-cached programs),
    discarding the output — the first production job of that shape bucket
    then runs at steady state. With ``--batch N`` BOTH programs a real
    stream hits are warmed: the size-N batched one (full groups) and the
    single one (non-batchable jobs, end-of-stream flushes, and the
    retry-singly path after a failed batch). Partial groups of size
    2..N-1 are distinct programs and still pay their compile on first
    use — streams with arbitrary flush sizes should prefer ``--batch``
    values they can fill."""
    import tempfile

    import numpy as np
    from PIL import Image

    def parse_hw(part, spec):
        try:
            h, w = (int(v) for v in part.split("x"))
            return h, w
        except ValueError:
            raise ValueError(
                f"--warmup expects HxW or HxW:HxW (e.g. 512x512 or "
                f"321x481:1600x1200), got {spec!r}"
            )

    with tempfile.TemporaryDirectory() as td:
        for i, spec in enumerate(args.warmup):
            parts = spec.lower().split(":")
            if len(parts) > 2:
                raise ValueError(
                    f"--warmup expects HxW or HxW:HxW, got {spec!r}"
                )
            sizes = [parse_hw(p, spec) for p in parts]
            if len(sizes) == 1:
                sizes = sizes * 2  # one size: content and style share it
            rng = np.random.default_rng(0)
            paths = []
            for (h, w), name in zip(sizes, ("c", "s")):
                img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
                p = os.path.join(td, f"warm{i}_{name}.png")
                Image.fromarray(img).save(p)
                paths.append(p)
            job = {"content": paths[0], "style": paths[1],
                   "output": os.path.join(td, f"warm{i}_out.png")}
            t0 = time.perf_counter()
            if args.batch > 1:
                _run_batch(args, [dict(job) for _ in range(args.batch)],
                           vgg_params, mesh=mesh)
            # always warm the single program: it serves non-batchable
            # jobs, end-of-stream flushes of one, and the retry-singly
            # fallback after a failed batch
            _run_single(args, job, vgg_params)
            logger.info(
                f"Warmed shape bucket {spec} in "
                f"{time.perf_counter() - t0:.1f}s."
            )


# sentinel distinguishing "signal.signal failed (not the main thread)"
# from "previous handler is None (installed from C, not restorable)"
_SIGNALS_UNAVAILABLE = object()


def _install_sigterm(state: Dict):
    """Graceful-drain SIGTERM handling for a long-lived serving process.

    The handler only sets ``state['draining']`` — it never raises, so a
    job line can never be consumed-but-lost and an in-flight job is never
    interrupted mid-write. Every blocking wait in the loop polls the flag
    (``_LineReader.readline``), so a SIGTERM while idle-blocked on stdin
    is observed within the poll interval. Returns the previous handler
    (which may be None for a C-installed one), or ``_SIGNALS_UNAVAILABLE``
    when not in the main thread (e.g. under a test runner's worker
    thread; drain degrades to "finish the stream")."""

    def on_sigterm(signum, frame):
        state["draining"] = True

    try:
        return signal.signal(signal.SIGTERM, on_sigterm)
    except ValueError:
        return _SIGNALS_UNAVAILABLE


def _restore_sigterm(prev) -> None:
    if prev is _SIGNALS_UNAVAILABLE:
        return
    # a None previous handler was installed from C and cannot be re-set
    # through the signal module — fall back to the default action so the
    # documented "a second SIGTERM kills the process" still holds
    signal.signal(signal.SIGTERM,
                  prev if prev is not None else signal.SIG_DFL)


class _LineReader:
    """Interruptible line reads from a (possibly blocking) job stream.

    ``readline`` in the stdlib cannot be safely interrupted by a signal
    handler that raises (the line may already be consumed from the pipe
    when the exception unwinds — silently losing a job). Instead, ONE
    daemon thread performs strictly pull-based reads — a line is only
    requested when the caller asks for one, so there is no read-ahead to
    lose — and the caller waits on a queue with a timeout, polling the
    drain flag between ticks."""

    _POLL_SECONDS = 0.25

    def __init__(self, stream):
        import queue
        import threading

        self._stream = stream
        self._req = threading.Semaphore(0)
        self._lines: "queue.Queue" = queue.Queue()
        self._empty = queue.Empty
        self._outstanding = False
        t = threading.Thread(target=self._reader, daemon=True,
                             name="strotss-serve-jobs")
        t.start()

    def _reader(self):
        while True:
            self._req.acquire()
            try:
                line = self._stream.readline()
            except Exception:
                line = ""  # stream closed under us: report EOF
            self._lines.put(line)
            if not line:
                return

    def readline(self, should_stop) -> Optional[str]:
        """Next raw line; "" at EOF; None when ``should_stop()`` turned
        true while waiting (the pending request stays live, so a line
        arriving later is returned by a subsequent call, not lost)."""
        if not self._outstanding:
            self._req.release()
            self._outstanding = True
        while True:
            try:
                line = self._lines.get(timeout=self._POLL_SECONDS)
                self._outstanding = False
                return line
            except self._empty:
                if should_stop():
                    return None

    def grace_line(self, timeout: float = 0.5) -> Optional[str]:
        """Final chance for a read left outstanding by a drain.

        When ``readline`` returned None, the reader thread may *already*
        have consumed a line from the stream (it was blocked in
        ``stream.readline()`` when the drain flag flipped, and a producer
        could land a line in that window) — exiting without this check
        would silently drop a consumed job, violating the one-result-per-
        consumed-line guarantee. Strictly pull-based reads mean at most ONE
        line can be in that state, so a single bounded wait covers it.
        Returns the line, or None if nothing was consumed within
        ``timeout`` (the reader is still blocked mid-``readline`` — nothing
        complete was taken off the stream)."""
        if not self._outstanding:
            return None
        try:
            line = self._lines.get(timeout=timeout)
            self._outstanding = False
            return line or None  # "" = EOF, nothing to recover
        except self._empty:
            return None


def _job_lines(path: str, should_stop=lambda: False):
    """Yield job lines; ends at EOF or when ``should_stop()`` turns true
    (checked during every blocking wait and between lines)."""
    stream = sys.stdin if path == "-" else open(path)
    reader = _LineReader(stream)
    try:
        while True:
            line = reader.readline(should_stop)
            if line is None:  # drain requested while a read was pending —
                # the reader may have consumed a line in the window between
                # the drain flag flipping and this poll observing it;
                # recover it so a consumed job still gets its result line
                line = reader.grace_line()
                if line:
                    line = line.strip()
                    if line and not line.startswith("#"):
                        yield line
                break
            if not line:  # "" = EOF
                break
            line = line.strip()
            if line and not line.startswith("#"):
                yield line
            if should_stop():
                break
    finally:
        if stream is not sys.stdin:
            stream.close()


def _shape_sig(args, job: Dict):
    """Loaded-image shape signature for batch grouping (header-only read).

    Warm-start presence is part of the signature: warm and cold jobs run
    different scale-0 programs (``stylize_batch(init_images=...)``), so
    groups stay homogeneous. Init *sizes* don't matter — each is resized
    once, directly to the first executed scale's chw (see _run_batch)."""
    from strotss_tpu.utils.io import image_size

    try:
        return (image_size(job["content"], max_size=args.max_size),
                image_size(job["style"], max_size=args.max_size),
                "init" in job)
    except Exception:
        return None  # let the single path surface the real error


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # stdout is the results stream (JSONL) by default — keep it clean by
    # routing ALL shared-logger output (weights loader, write_image,
    # warmup, the final summary) to stderr
    from strotss_tpu.utils.logging import route_to_stderr

    route_to_stderr()

    from strotss_tpu.cli import enable_compile_cache, set_device

    enable_compile_cache()
    set_device(args.device_id)

    try:
        mesh = _data_mesh(args)
    except ValueError as e:
        logger.error(str(e))
        return 2

    from strotss_tpu.models.weights import load_vgg_params

    vgg_params = load_vgg_params(
        "16", args.use_keras_weight)  # shared across all jobs

    if args.warmup:
        _warmup(args, vgg_params, mesh=mesh)

    out = sys.stdout if args.results == "-" else open(args.results, "w")

    def emit(result: Dict):
        out.write(json.dumps(result) + "\n")
        out.flush()

    def run(jobs: List[Dict]):
        if len(jobs) > 1:
            try:
                for r in _run_batch(args, jobs, vgg_params, mesh=mesh):
                    emit(r)
                return
            except Exception:
                # one bad input fails the whole batched program — retry the
                # jobs singly so the good ones still complete, and only the
                # bad one emits its (precise) error
                pass
        for job in jobs:
            try:
                emit(_run_single(args, job, vgg_params))
            except Exception as e:  # serving survives bad jobs
                emit({"output": job.get("output"), "ok": False,
                      "error": f"{type(e).__name__}: {e}"})

    n_done = 0
    t_start = time.perf_counter()
    pending: List[Dict] = []
    pending_sig = None
    sig_state: Dict = {"draining": False}
    prev_handler = _install_sigterm(sig_state)
    try:
        for line in _job_lines(args.jobs,
                               should_stop=lambda: sig_state["draining"]):
            try:
                job = json.loads(line)
                if not isinstance(job, dict):
                    raise ValueError("job line must be a JSON object")
            except ValueError as e:
                emit({"ok": False, "error": f"bad job line: {e}"})
                continue
            sig = (_shape_sig(args, job)
                   if args.batch > 1 and _batchable(job) else None)
            # a warm job whose init IS a pending job's output depends on
            # that job: flush the group first so the init is loaded FRESH
            # after its producer ran. Without this, re-running a
            # single-stream chain whose output files already exist (crash
            # recovery, changed style/budget) would batch frames together
            # and silently seed them from the PREVIOUS run's stale files.
            depends = sig is not None and "init" in job and any(
                os.path.abspath(p.get("output", "")) ==
                os.path.abspath(job["init"]) for p in pending
            )
            if pending and (sig is None or sig != pending_sig or depends):
                batch, pending = pending, []
                run(batch)
                n_done += len(batch)
            if sig is None:
                run([job])
                n_done += 1
            else:
                pending.append(job)
                pending_sig = sig
                # a full batch runs NOW — a queue feeding stdin must
                # not leave N finished-forming jobs waiting for job N+1
                if len(pending) >= args.batch:
                    batch, pending = pending, []
                    run(batch)
                    n_done += len(batch)
        if sig_state["draining"]:
            logger.info(
                f"SIGTERM: draining {len(pending)} pending job(s), "
                "then exiting."
            )
        # restore before the drain phase: a second SIGTERM aborts it
        _restore_sigterm(prev_handler)
        prev_handler = _SIGNALS_UNAVAILABLE  # don't restore twice
        if pending:
            run(pending)
            n_done += len(pending)
    finally:
        _restore_sigterm(prev_handler)
        if out is not sys.stdout:
            out.close()
    logger.info(
        f"Served {n_done} jobs in {time.perf_counter() - t_start:.2f}s."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
