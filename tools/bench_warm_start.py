"""Measure the warm-start (video / refinement) value on the real chip.

Scenario: a "video" of synthetic frames, each a small shift + noise of the
previous one. Frame 1 is stylized cold at the full default budget
(4 scales x 200 steps). Frame 2 is stylized (a) cold again at the full
budget, and (b) warm-started from frame 1's stylized output at reduced
step budgets (``init_image=`` / the "mid" scale-0 seed), measuring
end-to-end seconds and the final 512px loss on the SAME frame-2 inputs.

The question this answers with numbers: how many steps does a chained
frame need to match the cold run's final loss — i.e. what per-frame
throughput does the warm-start path buy a video pipeline beyond the
batched 3.75 s/image?

Run: ``python tools/bench_warm_start.py [--iters 200,100,50]``
Output: one human-readable table on stderr + one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/strotss_tpu/jaxcache"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synth_image  # noqa: E402  (deterministic bench inputs)
from strotss_tpu.config import StrotssConfig  # noqa: E402
from strotss_tpu.models.weights import load_vgg_params  # noqa: E402
from strotss_tpu.solve import stylize_single  # noqa: E402


def next_frame(frame: jnp.ndarray, seed: int) -> jnp.ndarray:
    """Frame t+1: a 4px pan of frame t plus small temporal noise — the
    small-motion regime video warm-starting targets."""
    rng = np.random.default_rng(seed)
    shifted = jnp.roll(frame, shift=(2, 4), axis=(1, 2))
    noise = jnp.asarray(rng.normal(0, 0.01, frame.shape), jnp.float32)
    return jnp.clip(shifted + noise, 0.0, 1.0)


def run(content, style, cfg, params, init=None):
    t0 = time.perf_counter()
    img, info = stylize_single(content, style, cfg, params,
                               init_image=init)
    jax.block_until_ready(img)
    return img, info, time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=str, default="200,100,50",
                    help="warm-start step budgets to measure")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    frame1 = synth_image(321, 481, 1)
    style = synth_image(1600, 1200, 2)
    frame2 = next_frame(frame1, 77)
    cfg = StrotssConfig()  # the bench default: bf16, 4x200
    params = load_vgg_params(cfg.vgg_type, cfg.use_keras_weight)

    # frame 1 cold (also the compile warmup for the cold programs)
    styl1, _, t_w = run(frame1, style, cfg, params)
    print(f"# frame1 cold (incl. any compile): {t_w:.2f}s", file=sys.stderr)
    styl1 = jnp.asarray(np.asarray(styl1, np.float32) / 255.0)[None]

    # frame 2 cold reference (steady state, all programs warm)
    _, info_c, t_cold = run(frame2, style, cfg, params)
    loss_cold = float(info_c["scales"][-1]["loss"])
    print(f"# frame2 cold: {t_cold:.2f}s loss={loss_cold:.4f}",
          file=sys.stderr)

    rows = []
    for it in (int(x) for x in args.iters.split(",")):
        wcfg = StrotssConfig(max_iter=it,
                             log_every=min(200, it),
                             compute_dtype=cfg.compute_dtype)
        # one compile pass PER VARIANT so the measured runs are
        # steady-state (warm and cold scale-0 are different programs)
        run(frame2, style, wcfg, params, init=styl1)
        run(frame2, style, wcfg, params)
        _, info_w, t_warm = run(frame2, style, wcfg, params, init=styl1)
        # cold at the SAME budget: the fair convergence comparison — the
        # question is whether warm-starting buys loss at a given budget,
        # not how a reduced budget compares to the full one
        _, info_cb, t_cb = run(frame2, style, wcfg, params)
        loss_w = float(info_w["scales"][-1]["loss"])
        loss_cb = float(info_cb["scales"][-1]["loss"])
        rows.append({"iters": it,
                     "warm": {"seconds": round(t_warm, 2),
                              "loss": round(loss_w, 4)},
                     "cold": {"seconds": round(t_cb, 2),
                              "loss": round(loss_cb, 4)}})
        print(f"# frame2 @{it:4d} steps/scale: warm {t_warm:.2f}s "
              f"loss={loss_w:.4f} | cold {t_cb:.2f}s loss={loss_cb:.4f} "
              f"({t_cold / t_warm:.2f}x faster than the full budget)",
              file=sys.stderr)

    print(json.dumps({"full_cold": {"seconds": round(t_cold, 2),
                                    "loss": round(loss_cold, 4)},
                      "budgets": rows}))


if __name__ == "__main__":
    main()
