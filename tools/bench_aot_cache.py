"""Measure AOT-executable serialization as a warm-start shortcut.

Warm start today = Python trace/lower (~12 s serial, GIL-bound) +
persistent-cache compile round-trips (~2 s each) + remote program loads.
``jax.experimental.serialize_executable`` can skip the first two
entirely: a fresh process deserializes ready-to-load executables from
disk. This tool measures both phases on the REAL bench programs:

    python tools/bench_aot_cache.py save   # build + serialize all scales
    python tools/bench_aot_cache.py load   # fresh process: deserialize,
                                           # execute 64px program once
    python tools/bench_aot_cache.py load0  # fresh process: deserialize
                                           # ONLY scale-0 (VERDICT r4 #5:
                                           # one-program scope shrinks the
                                           # deserialize cost and the
                                           # lazy-failure blast radius),
                                           # execute it once

If `load` lands well under the ~26 s lower+compile warm floor, the
mechanism graduates into ``precompile_scales``.
"""

from __future__ import annotations

import os
import pickle
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/strotss_tpu/jaxcache"))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

CACHE = os.path.expanduser("~/.cache/strotss_tpu/aot_experiment")


def _bench_inputs():
    import jax.numpy as jnp
    import numpy as np

    def synth(h, w, seed):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))

    return synth(321, 481, 1), synth(1600, 1200, 2)


def main() -> None:
    phase = sys.argv[1] if len(sys.argv) > 1 else "save"
    if phase not in ("save", "load", "load0"):
        # a typo'd phase must not silently run the all-scales "load"
        # measurement (these numbers are cited in DEPLOY/ROUND5 docs)
        raise SystemExit(f"unknown phase {phase!r}: expected save|load|load0")
    t_start = time.perf_counter()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import load_vgg_params
    from strotss_tpu.solve import (
        chunk_plan,
        precompile_scales,
        scale_state_templates,
        resize_max_hw,
        source_tag,
        spec_from_config,
    )
    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    print(f"# imports: {time.perf_counter() - t_start:.2f}s")
    cfg = StrotssConfig(compute_dtype="bfloat16")
    spec = spec_from_config(cfg)
    content, style = _bench_inputs()
    params = load_vgg_params(cfg.vgg_type, cfg.use_keras_weight)

    if phase == "save":
        os.makedirs(CACHE, exist_ok=True)
        t0 = time.perf_counter()
        programs = precompile_scales(
            cfg, spec, params, content.shape, style.shape
        )
        programs.wait_all()
        print(f"# trace+lower+compile all scales: "
              f"{time.perf_counter() - t0:.2f}s "
              f"(per-program: {programs.timings})")
        for key, fut in programs._futs.items():
            compiled = fut.result()
            t0 = time.perf_counter()
            payload, in_tree, out_tree = serialize(compiled)
            path = os.path.join(CACHE, f"scale{key[0]}_n{key[1]}.pkl")
            with open(path, "wb") as f:
                pickle.dump((key, payload, in_tree, out_tree), f)
            print(f"# serialize {key}: {len(payload) / 1e6:.1f} MB "
                  f"in {time.perf_counter() - t0:.2f}s -> {path}")
        return

    # ---- load phases (run in a FRESH process) ------------------------------
    # "load": deserialize ALL scales. "load0": ONLY scale-0 — measures the
    # floor of a hybrid warm start where scale 0 skips trace/lower/compile
    # and scales 1-3 take the normal precompile path concurrently.
    only0 = phase == "load0"
    loaded = {}
    t_load0 = time.perf_counter()
    files = sorted(os.listdir(CACHE))
    if only0:
        files = [fn for fn in files if fn.startswith("scale0_")]
    for fn in files:
        with open(os.path.join(CACHE, fn), "rb") as f:
            key, payload, in_tree, out_tree = pickle.load(f)
        t0 = time.perf_counter()
        loaded[key] = deserialize_and_load(payload, in_tree, out_tree)
        print(f"# deserialize {key}: {time.perf_counter() - t0:.2f}s")
    print(f"# all deserialized: {time.perf_counter() - t_load0:.2f}s "
          f"(since start: {time.perf_counter() - t_start:.2f}s)")

    # execute the 64px program once with aval-correct arguments
    (i, n, prev_shape) = sorted(loaded)[0]
    prog = loaded[(i, n, prev_shape)]
    scl = cfg.scale_sizes()[i]
    chw = resize_max_hw(content.shape[1], content.shape[2], scl)
    pyr, opt = scale_state_templates(chw, cfg.pyramid_levels, cfg.lr)
    prev = jnp.zeros(prev_shape, jnp.float32)
    # k_style and the DONATED step key must be distinct buffers (aliasing
    # a donated input is an INVALID_ARGUMENT on this backend)
    k_style, k_run = jax.random.split(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    out = prog(
        params, content, style, prev, jnp.asarray(True, jnp.bool_),
        k_style, pyr, opt, k_run,
        jnp.asarray(cfg.initial_alpha(), jnp.float32),
        jnp.asarray(cfg.lr, jnp.float32), None, None, source_tag(),
    )
    metrics = np.asarray(jax.device_get(out[3]))
    print(f"# 64px first execution (incl. program load): "
          f"{time.perf_counter() - t0:.2f}s; loss={metrics[-1, 0]:.4f}; "
          f"total warm start: {time.perf_counter() - t_start:.2f}s")


if __name__ == "__main__":
    main()
