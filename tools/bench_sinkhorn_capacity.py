"""Demonstrate the streamed Sinkhorn's beyond-HBM capability boundary.

One val+grad call each at N=32768 (f32 cost matrix alone = 4.3 GB;
XLA's ~3 NxN live buffers exceed the v5e's 16 GB HBM) for both impls.
Companion to tools/bench_sinkhorn.py, which showed no *speed* crossover
anywhere XLA fits — the streamed kernel is a capacity feature.

    python tools/bench_sinkhorn_capacity.py [--n 32768] [--iters 30]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/strotss_tpu/jaxcache"))

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--channels", type=int, default=2179)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--lam", type=float, default=10.0)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu.ops import losses as L

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.n, args.channels)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((args.n, args.channels)), jnp.float32)

    for impl in ("pallas", "xla"):
        def fn(yy, impl=impl):
            return L.sinkhorn(x, yy, "cosine", args.lam, args.iters,
                              impl=impl)

        try:
            t0 = time.perf_counter()
            v, g = jax.value_and_grad(fn)(y)
            jax.device_get(g[0, 0])
            dt = time.perf_counter() - t0
            print(json.dumps({"n": args.n, "impl": impl,
                              "val_grad_s": round(dt, 2),
                              "loss": float(v)}), flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(json.dumps({"n": args.n, "impl": impl,
                              "error": f"{type(e).__name__}: {msg}"}),
                  flush=True)


if __name__ == "__main__":
    main()
