"""Video-chain serving throughput: M interleaved warm streams on chip.

The headline number for the warm batched-streams capability (VERDICT r3
next-round 6): M synthetic video streams are stylized frame-coherently by
chaining each frame's job with ``"init": <previous frame's output>``
through a real ``strotss_tpu.serve`` subprocess with ``--batch M``.
Frames are interleaved stream-major (frame f of every stream, then frame
f+1), so each batch group is one frame across all M streams; every group
after the first depends on the previous group's outputs (the chained
inits), which serve's dependency flush keeps ordered.

The reference has no analogue (``/root/reference/run_strotss.py`` is one
pair per process); this justifies the new capability with a measured
number vs the 3.75 s/image batched cold floor.

Usage:
    python tools/bench_video.py [--streams 8] [--frames 4] [--size 512]
Writes tools/bench_video.json and prints it.
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


def synth_frame(h, w, stream, frame):
    """Smooth synthetic video: per-stream base pattern + a drifting
    gradient so consecutive frames are similar but not identical (the
    warm-start regime video chains actually run in)."""
    rng = np.random.default_rng(1000 + stream)
    blocks = rng.random((h // 8 + 1, w // 8 + 1, 3))
    img = np.kron(blocks, np.ones((8, 8, 1)))[:h, :w]
    yy, xx = np.mgrid[0:h, 0:w]
    drift = 0.15 * np.sin((xx + 37.0 * frame) / w * 2 * np.pi)[..., None]
    return (np.clip(img + drift, 0, 1) * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", type=int, default=512,
                    help="content frame size (HxW = size x ~3/4 size)")
    ap.add_argument("--max_iter", type=int, default=200)
    ap.add_argument("--out", type=str,
                    default=os.path.join(HERE, "bench_video.json"))
    args = ap.parse_args()

    from PIL import Image

    M, F = args.streams, args.frames
    h, w = args.size, args.size * 3 // 4
    td = tempfile.mkdtemp(prefix="strotss_video_")
    style_p = os.path.join(td, "style.png")
    Image.fromarray(synth_frame(args.size, args.size, 999, 0)).save(style_p)

    jobs = []
    outputs = {}
    for f in range(F):
        for m in range(M):
            cp = os.path.join(td, f"s{m}_f{f}.png")
            Image.fromarray(synth_frame(h, w, m, f)).save(cp)
            op = os.path.join(td, f"out_s{m}_f{f}.png")
            job = {"content": cp, "style": style_p, "output": op}
            if f > 0:
                job["init"] = outputs[(m, f - 1)]
            outputs[(m, f)] = op
            jobs.append(job)

    cmd = [sys.executable, "-u", "-m", "strotss_tpu.serve",
           "--jobs", "-", "--batch", str(M),
           "--max_iter", str(args.max_iter)]
    # PREPEND to PYTHONPATH — replacing it would drop this environment's
    # sitecustomize dir (where the TPU backend plugin registers) and the
    # serve subprocess would silently fall back to CPU
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.perf_counter()
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE, text=True, env=env,
                            cwd=REPO)
    stdin_payload = "".join(json.dumps(j) + "\n" for j in jobs)
    out_text, _ = proc.communicate(stdin_payload, timeout=3600)
    wall = time.perf_counter() - t0
    assert proc.returncode == 0, f"serve exited {proc.returncode}"

    results = [json.loads(line) for line in out_text.splitlines() if line]
    assert len(results) == M * F, (len(results), M * F)
    assert all(r.get("ok") for r in results), results
    # group wall-clock per frame index: results arrive in dispatch order
    # (M per frame); r["seconds"] is the per-job amortized device+host
    # time of its group
    per_frame = [results[f * M]["seconds"] for f in range(F)]
    warm_frames = per_frame[1:]  # frame 0 is the cold batch (+ compiles)
    s_per_frame_image = float(np.mean(warm_frames)) if warm_frames else None

    report = {
        "streams": M,
        "frames": F,
        "content_hw": [h, w],
        "max_iter_per_scale": args.max_iter,
        "wall_seconds_total": round(wall, 2),
        "frame0_cold_s_per_image": per_frame[0],
        "warm_chain_s_per_image": (round(s_per_frame_image, 3)
                                   if s_per_frame_image else None),
        "images_per_min_per_chip": (round(60.0 / s_per_frame_image, 1)
                                    if s_per_frame_image else None),
        "batched_cold_floor_s_per_image": 3.75,
        "per_frame_s_per_image": per_frame,
        # a group that failed batched and was retried job-by-job reports
        # no "batched" key — surface those as 0 rather than crashing the
        # report on a None<int comparison after the whole on-chip run
        "batched_counts": sorted(
            {r.get("batched") or 0 for r in results}
        ),
    }
    with open(args.out, "w") as fobj:
        json.dump(report, fobj, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
