"""Heterogeneous-batch serving throughput on chip (VERDICT r4 item 6).

The scheduler-invariance contract (per-pair ``alpha``/``seed`` riding the
batched pair axis — ``serve.py`` batches jobs that differ in both) is
CPU-tested; this tool demonstrates ON THE CHIP that heterogeneity costs
nothing: it drives a real ``strotss_tpu.serve`` subprocess with
``--batch B`` and alternating groups of

- UNIFORM jobs (same alpha, same seed — the regime ``bench_video.py``
  and ``STROTSS_BENCH_BATCH`` already measured), and
- MIXED jobs (B distinct alphas spanning 0.25x-4x the default and B
  distinct seeds — one compiled program regardless: alpha enters only
  the loss scalarization, seeds only the key rows),

then compares warm per-image seconds between the two. The first group is
the cold one (compiles + program loads) and is excluded.

Reference analogue: B independent ``run()`` processes
(``/root/reference/run_strotss.py:43-161``), each re-paying its traces.

Usage:
    python tools/bench_mixed_batch.py [--batch 8] [--groups 2] [--size 512]
Writes tools/bench_mixed_batch.json and prints it.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def synth(h, w, seed):
    rng = np.random.default_rng(seed)
    blocks = rng.random((h // 8 + 1, w // 8 + 1, 3))
    return (np.kron(blocks, np.ones((8, 8, 1)))[:h, :w] * 255).astype(
        np.uint8
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--groups", type=int, default=2,
                    help="warm group PAIRS (uniform+mixed) after the cold "
                         "group")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--max_iter", type=int, default=200)
    ap.add_argument("--out", type=str,
                    default=os.path.join(HERE, "bench_mixed_batch.json"))
    args = ap.parse_args()

    from PIL import Image

    B = args.batch
    h, w = args.size, args.size * 3 // 4
    td = tempfile.mkdtemp(prefix="strotss_mixed_")
    cp = os.path.join(td, "c.png")
    sp = os.path.join(td, "s.png")
    Image.fromarray(synth(h, w, 1)).save(cp)
    Image.fromarray(synth(args.size, args.size, 2)).save(sp)

    alphas = [0.25, 0.5, 1.0, 2.0, 4.0, 8.0, 12.0, 16.0]

    def group(kind, gi):
        jobs = []
        for b in range(B):
            job = {"content": cp, "style": sp,
                   "output": os.path.join(td, f"out_{kind}{gi}_{b}.png")}
            if kind == "mixed":
                job["alpha"] = alphas[b % len(alphas)]
                job["seed"] = 100 * gi + b
            jobs.append(job)
        return jobs

    jobs = group("uniform", 0)  # cold group (compiles + loads), dropped
    kinds = []
    for gi in range(1, args.groups + 1):
        jobs += group("uniform", gi)
        kinds.append("uniform")
        jobs += group("mixed", gi)
        kinds.append("mixed")

    cmd = [sys.executable, "-u", "-m", "strotss_tpu.serve",
           "--jobs", "-", "--batch", str(B),
           "--max_iter", str(args.max_iter)]
    # PREPEND to PYTHONPATH (replacing it drops the sitecustomize dir that
    # registers the TPU plugin — the subprocess would silently run on CPU)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.perf_counter()
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE, text=True, env=env,
                            cwd=REPO)
    payload = "".join(json.dumps(j) + "\n" for j in jobs)
    out_text, _ = proc.communicate(payload, timeout=3600)
    wall = time.perf_counter() - t0
    assert proc.returncode == 0, f"serve exited {proc.returncode}"

    results = [json.loads(line) for line in out_text.splitlines() if line]
    assert len(results) == len(jobs), (len(results), len(jobs))
    assert all(r.get("ok") for r in results), results
    assert all(r.get("batched") == B for r in results), \
        "a group fell off the batched path"
    per_group = [results[g * B]["seconds"]
                 for g in range(len(results) // B)]
    warm = per_group[1:]
    uni = [s for s, k in zip(warm, kinds) if k == "uniform"]
    mix = [s for s, k in zip(warm, kinds) if k == "mixed"]
    # mixed seeds/alphas must actually change the outputs
    from PIL import Image as I

    a = np.asarray(I.open(os.path.join(td, "out_mixed1_0.png")), int)
    b = np.asarray(I.open(os.path.join(td, "out_mixed1_1.png")), int)
    assert np.abs(a - b).max() > 0, "mixed jobs produced identical images"

    report = {
        "batch": B,
        "content_hw": [h, w],
        "max_iter_per_scale": args.max_iter,
        "wall_seconds_total": round(wall, 2),
        "cold_group_s_per_image": per_group[0],
        "warm_uniform_s_per_image": [round(s, 3) for s in uni],
        "warm_mixed_s_per_image": [round(s, 3) for s in mix],
        "mixed_over_uniform": (round(float(np.mean(mix)) /
                                     float(np.mean(uni)), 4)
                               if uni and mix else None),
        "alphas": alphas[:B],
    }
    with open(args.out, "w") as fobj:
        json.dump(report, fobj, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
