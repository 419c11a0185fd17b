"""Measure a per-step ``io_callback`` metrics tap (VERDICT r3 item 8).

The reference shows true per-iteration progress (tqdm postfix every step,
``/root/reference/run_strotss.py:145-152``). Our scan-based solver replays
per-step metrics at chunk boundaries instead (``log_every``); the open
question is what a REAL per-step host tap costs through this backend's
~30 ms-per-dispatch tunnel. This tool answers it once, with the exact
solver step body (imports the same private pieces ``tools/trace_step.py``
uses), comparing amortized step time of:

  a) the plain ``lax.scan`` chunk (the shipped path),
  b) the same scan with ``jax.experimental.io_callback(tap, None,
     metrics, ordered=True)`` in the body (per-step host metrics, in
     order — what a live tqdm bar needs),
  c) same but ``ordered=False`` (allows the runtime to pipeline taps).

If the overhead is <2%, a ``--live_progress`` CLI flag is justified;
either way the number closes r2-missing-#2 / r3-item-8 permanently.

    python tools/bench_live_progress.py [--scale 64] [--steps 50]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/strotss_tpu/jaxcache"))

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=64,
                    help="64 is the worst RELATIVE case (1.68 ms steps); "
                         "512 the absolute one")
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--modes", type=str, default="none,ordered,unordered",
                    help="comma list; run one mode per process when a mode "
                         "can hang (a stalled callback program would "
                         "otherwise eat the other modes' budget)")
    ap.add_argument("--base_ms", type=float, default=None,
                    help="baseline step_ms from a previous mode=none run "
                         "(for overhead_pct in single-mode processes)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import load_vgg_params
    from strotss_tpu.ops.image import fold_laplacian_pyramid
    from strotss_tpu.solve import (
        _extract_j,
        _scale_init_j,
        _step_losses,
        _style_targets_j,
        extract_for_grad,
        init_opt_state,
        make_optimizer,
        resize_max_hw,
        spec_from_config,
        style_target_moments,
    )

    cfg = StrotssConfig(compute_dtype=args.dtype, sample_size=args.samples)
    spec = spec_from_config(cfg)
    params = load_vgg_params()
    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.random((1, 321, 481, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 400, 300, 3)), jnp.float32)
    chw = resize_max_hw(321, 481, args.scale)
    shw = resize_max_hw(400, 300, args.scale)
    scl_c, scl_s, pyramid = _scale_init_j(
        "first", chw, shw, cfg.pyramid_levels, content, style, content
    )
    cf = _extract_j(spec, params, scl_c)
    sf = _extract_j(spec, params, scl_s)
    key = jax.random.PRNGKey(0)
    target = _style_targets_j(spec, key, sf)
    tmom = style_target_moments(spec, target, masked=False)
    opt_state = init_opt_state(cfg.lr, pyramid)
    alpha = jnp.float32(16.0)
    lrt = jnp.float32(cfg.lr)
    n = args.steps

    taps_seen = []

    def host_tap(m):
        # what a live progress bar would do: a cheap host-side record
        taps_seen.append(np.asarray(m))

    import functools

    from jax.experimental import io_callback

    def make_chunk(tap_mode):
        opt = make_optimizer(lrt)

        def loss_fn(pyr, k):
            img = fold_laplacian_pyramid(pyr)
            pred = extract_for_grad(spec, params, img)
            return _step_losses(spec, cf, pred, target, None, alpha, k,
                                style_moments=tmom)

        def step(carry, _):
            pyr, ostate, k = carry
            k, k_step = jax.random.split(k)
            (loss, (lc, ls)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(pyr, k_step)
            updates, ostate = opt.update(grads, ostate)
            import optax

            pyr = optax.apply_updates(pyr, updates)
            m = jnp.stack([loss, lc, ls])
            if tap_mode == "ordered":
                io_callback(host_tap, None, m, ordered=True)
            elif tap_mode == "unordered":
                io_callback(host_tap, None, m, ordered=False)
            return (pyr, ostate, k), m

        @functools.partial(jax.jit, static_argnames=())
        def chunk(pyr, ostate, k):
            return jax.lax.scan(step, (pyr, ostate, k), None, length=n)

        return chunk

    def sync(o):
        # only a host fetch truly waits on this backend
        jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    report = {"scale": args.scale, "dtype": args.dtype,
              "steps_per_chunk": n, "reps": args.reps}
    base_ms = args.base_ms
    for mode in [m.strip() for m in args.modes.split(",") if m.strip()]:
        taps_seen.clear()
        try:
            print(f"# mode={mode}: compiling + first execution (program "
                  "load happens here)...", file=sys.stderr, flush=True)
            t_warm = time.perf_counter()
            chunk = make_chunk(mode)
            state = (pyramid, opt_state, key)
            out = chunk(*state)
            sync(out[0])
            print(f"# mode={mode}: warm in "
                  f"{time.perf_counter() - t_warm:.1f}s; timing...",
                  file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = chunk(*out[0])
            sync(out[0])
            ms = (time.perf_counter() - t0) / (args.reps * n) * 1000.0
            entry = {"step_ms": round(ms, 3),
                     "taps_delivered": len(taps_seen)}
            if mode == "none":
                base_ms = ms
            elif base_ms:
                entry["overhead_pct"] = round((ms / base_ms - 1) * 100, 1)
            report[mode] = entry
        except Exception as e:  # honest failure: callbacks may simply not
            # be supported through the remote-compile relay
            report[mode] = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
