"""Measure serve's host-I/O fraction of a batch group (VERDICT r3 item 5).

Serve's batch path is: load+decode B pairs (serial, host) -> stylize_batch
(device) -> write B outputs (serial, host). The proposed optimization is
prefetching the NEXT group's decode while the device runs the current
group — its maximum possible win is exactly the load phase's share of the
group wall-clock. This tool measures that share at B=8 with the
reference-demo image sizes (481x321 content / 1200x1600 style JPEGs, the
workload behind the 3.75 s/image batched number) using serve's own
loaders, so the keep-if->3% decision rests on a number, not a hunch.

    python tools/bench_serve_io.py [--batch 8] [--reps 3]
"""

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/strotss_tpu/jaxcache"))

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def smooth(h, w, seed):
    rng = np.random.default_rng(seed)
    blocks = rng.random((h // 8 + 1, w // 8 + 1, 3))
    return (np.kron(blocks, np.ones((8, 8, 1)))[:h, :w] * 255).astype(
        np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--max_iter", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu import serve
    from strotss_tpu.models.weights import load_vgg_params
    from strotss_tpu.parallel.batch import stylize_batch
    from strotss_tpu.utils.io import write_image

    B = args.batch
    td = tempfile.mkdtemp(prefix="strotss_io_")
    jobs = []
    for b in range(B):
        cp = os.path.join(td, f"c{b}.jpg")
        sp = os.path.join(td, f"s{b}.jpg")
        # reference demo sizes: content 481x321, style 1200x1600
        Image.fromarray(smooth(321, 481, b)).save(cp, quality=95)
        Image.fromarray(smooth(1600, 1200, 100 + b)).save(sp, quality=95)
        jobs.append({"content": cp, "style": sp,
                     "output": os.path.join(td, f"o{b}.jpg")})

    serve_args = serve.build_parser().parse_args(
        ["--max_iter", str(args.max_iter)])
    params = load_vgg_params("16", False)
    cfg = serve._config(serve_args, jobs[0])

    rows = []
    for rep in range(args.reps + 1):  # rep 0 = compile warmup, dropped
        t0 = time.perf_counter()
        loaded = [serve._load_job_inputs(serve_args, j) for j in jobs]
        contents = jnp.concatenate([x[0] for x in loaded])
        styles = jnp.concatenate([x[1] for x in loaded])
        t_load = time.perf_counter() - t0

        t0 = time.perf_counter()
        imgs, info = stylize_batch(contents, styles, cfg, vgg_params=params)
        np.asarray(imgs)  # the fetch serve's write path performs
        t_run = time.perf_counter() - t0

        t0 = time.perf_counter()
        for b, job in enumerate(jobs):
            write_image(imgs[b], job["output"])
        t_write = time.perf_counter() - t0
        if rep == 0:
            continue
        rows.append((t_load, t_run, t_write))

    load = float(np.mean([r[0] for r in rows]))
    run = float(np.mean([r[1] for r in rows]))
    write = float(np.mean([r[2] for r in rows]))
    total = load + run + write
    report = {
        "batch": B,
        "reps": args.reps,
        "load_s": round(load, 3),
        "run_s": round(run, 3),
        "write_s": round(write, 3),
        "group_total_s": round(total, 3),
        "s_per_image": round(total / B, 3),
        "load_pct_of_group": round(load / total * 100, 2),
        "write_pct_of_group": round(write / total * 100, 2),
        "prefetch_max_win_pct": round(load / total * 100, 2),
        "keep_bar_pct": 3.0,
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
