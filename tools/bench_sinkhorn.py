"""Measure streamed (Pallas) vs materialized (XLA) Sinkhorn on real TPU.

VERDICT r2 item 6: the ``impl='auto'`` crossover in
``strotss_tpu.ops.losses.sinkhorn`` must come from measurement, not a
guess. This times value+grad (the solver's usage: gradients flow to the
prediction features) for both implementations across sample counts and
prints a table plus the measured crossover.

    python tools/bench_sinkhorn.py [--channels 2179] [--iters 30]

Timing notes for this box: per-call dispatch through the TPU tunnel is
~30 ms, so each measurement loops the op inside one jitted ``lax.scan``
chunk and divides — the same amortized-measurement recipe as bench.py.
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


def timed_scan(fn, x, y, reps=8):
    """Mean ms/call of value+grad, amortized inside one scan per rep."""

    @jax.jit
    def chunk(x, y):
        def body(c, _):
            # fold the carry into x so XLA can't hoist the whole op out
            v, g = jax.value_and_grad(fn)(y + 0.0 * c)
            return c + v * 1e-20, g[0, 0]

        c, gs = jax.lax.scan(body, jnp.float32(0.0), None, length=4)
        return c, gs

    def sync(o):
        # axon's block_until_ready returns before execution completes;
        # only a host fetch truly waits (CLAUDE.md relay notes)
        jax.device_get(o[0])

    out = chunk(x, y)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chunk(x, y)
    sync(out)
    return (time.perf_counter() - t0) / (reps * 4) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=2179)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--lam", type=float, default=10.0)
    ap.add_argument("--sizes", type=str, default="2048,4096,8192,16384")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu.ops import losses as L

    sizes = [int(s) for s in args.sizes.split(",")]
    rng = np.random.default_rng(0)
    rows = []
    for n in sizes:
        x = jnp.asarray(rng.standard_normal((n, args.channels)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((n, args.channels)), jnp.float32)

        res = {"n": n}
        for impl in ("xla", "pallas"):
            def fn(yy, impl=impl):
                return L.sinkhorn(x, yy, "cosine", args.lam, args.iters,
                                  impl=impl)

            try:
                ms = timed_scan(fn, x, y, reps=args.reps)
                res[impl] = round(ms, 2)
            except Exception as e:
                res[impl] = f"FAIL:{type(e).__name__}"
                print(f"# n={n} impl={impl} failed: {e}", file=sys.stderr)
        rows.append(res)
        print(json.dumps(res), flush=True)

    # crossover: smallest n where the streamed kernel wins
    cross = None
    for r in rows:
        if isinstance(r.get("xla"), float) and isinstance(
            r.get("pallas"), float
        ) and r["pallas"] < r["xla"]:
            cross = r["n"]
            break
    print(json.dumps({"crossover_n": cross}))


if __name__ == "__main__":
    main()
