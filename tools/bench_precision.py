"""Measure the loss-stack matmul-precision ladder on the real TPU.

The bf16 default runs loss matmuls at 'high' (3-pass bf16, ceiling ~65
TF/s on v5e). The coarse-scale step floor is ~95% loss-stack FLOPs
(docs/MXU.md), so dropping to 'default' (1-pass bf16, ceiling 197 TF/s)
is the candidate win there. This times:

1. the fused loss stack (value+grad of ``_step_losses``) amortized in a
   scan, at each precision;
2. a full 50-step ``run_chunk`` at 64px and 512px with
   ``loss_precision`` overridden — the end-to-end delta.

    python tools/bench_precision.py
"""

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


def _sync(out):
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import load_vgg_params
    from strotss_tpu.solve import (
        _extract_j,
        _scale_init_j,
        _style_targets_j,
        _step_losses,
        init_opt_state,
        resize_max_hw,
        run_chunk,
        spec_from_config,
        style_target_moments,
    )

    cfg = StrotssConfig()  # bf16 default
    base_spec = spec_from_config(cfg)
    params = load_vgg_params()
    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.random((1, 321, 481, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 400, 300, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)

    # --- 1. fused loss stack value+grad at 64px features -----------------
    chw = resize_max_hw(321, 481, 64)
    shw = resize_max_hw(400, 300, 64)
    scl_c, scl_s, pyramid = _scale_init_j(
        "first", chw, shw, cfg.pyramid_levels, content, style, content
    )
    for prec in ("highest", "high", "default"):
        spec = base_spec._replace(loss_precision=prec)
        cf = _extract_j(spec, params, scl_c)
        sf = _extract_j(spec, params, scl_s)
        target = _style_targets_j(spec, key, sf)
        tmom = style_target_moments(spec, target, masked=False)
        alpha = jnp.float32(16.0)

        def lossfn(pred_feats, k):
            loss, _ = _step_losses(spec, cf, pred_feats, target, None,
                                   alpha, k, style_moments=tmom)
            return loss

        @jax.jit
        def chunk(feats, k):
            def body(c, kk):
                v, g = jax.value_and_grad(lossfn)(feats, kk)
                return c + v * 1e-20, None

            ks = jax.random.split(k, 16)
            c, _ = jax.lax.scan(body, jnp.float32(0.0), ks)
            return c

        out = chunk(cf, key)
        _sync(out)
        t0 = time.perf_counter()
        reps = 8
        for i in range(reps):
            out = chunk(cf, jax.random.fold_in(key, i))
        _sync(out)
        ms = (time.perf_counter() - t0) / (reps * 16) * 1000.0
        print(json.dumps({"what": "loss_stack_valgrad_64px",
                          "precision": prec, "ms": round(ms, 3)}),
              flush=True)

    # --- 2. full run_chunk at 64px / 512px, high vs default --------------
    for scale in (64, 512):
        chw = resize_max_hw(321, 481, scale)
        shw = resize_max_hw(400, 300, scale)
        scl_c, scl_s, pyramid = _scale_init_j(
            "first", chw, shw, cfg.pyramid_levels, content, style, content
        )
        for prec in ("high", "default"):
            spec = base_spec._replace(loss_precision=prec)
            cf = _extract_j(spec, params, scl_c)
            sf = _extract_j(spec, params, scl_s)
            target = _style_targets_j(spec, key, sf)
            opt_state = init_opt_state(cfg.lr, pyramid)
            alpha = jnp.float32(16.0)
            lrt = jnp.float32(cfg.lr)
            n = 50

            def chunk(pyr, ostate, k):
                return run_chunk(spec, n, params, cf, target, None,
                                 pyr, ostate, k, alpha, lrt)

            try:
                out = chunk(pyramid, opt_state, key)
                _sync(out[0])
            except Exception as e:
                # documented (docs/MXU.md): the axon backend rejects the
                # whole-stack 'default' chunk at first execution — report
                # the rung instead of dying so the ladder stays runnable
                print(json.dumps({"what": f"run_chunk_{scale}px",
                                  "precision": prec,
                                  "backend_rejected":
                                      f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)
                continue
            t0 = time.perf_counter()
            reps = 4
            for _ in range(reps):
                out = chunk(*out[:3])
            _sync(out[0])
            ms = (time.perf_counter() - t0) / (reps * n) * 1000.0
            print(json.dumps({"what": f"run_chunk_{scale}px",
                              "precision": prec,
                              "step_ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
