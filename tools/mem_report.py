"""Per-program HBM footprints + single-chip resolution capacity.

For each requested long-edge resolution, AOT-compiles the per-scale
programs of the default workload at the bench aspect ratios (content
2:3-ish, style 4:3 — the bundled demo geometry) and reports each
program's XLA-planned memory (`Compiled.memory_analysis()`): argument,
output, and temp (live intermediate) bytes. With ``--run`` the largest
resolution is then executed end-to-end, turning the plan into a
demonstrated capacity number.

This quantifies (a) where the v5e's 16 GB goes at each scale, (b) the
single-chip resolution ceiling for the default config, past which
``cfg.shard_spatial`` (GSPMD spatial partitioning) is the escape hatch,
and (c) why batch B=8 is the throughput sweet spot (per-pair temp
footprint x B approaches the HBM budget; see docs/DEPLOY.md).

Usage: python tools/mem_report.py [--long_edges 512,1024,2048] [--run]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synth_image  # noqa: E402
from strotss_tpu.config import StrotssConfig  # noqa: E402
from strotss_tpu.models.weights import load_vgg_params  # noqa: E402
from strotss_tpu.solve import (  # noqa: E402
    precompile_scales,
    spec_from_config,
    stylize_single,
)

MB = 1024 * 1024


def content_shape_for(long_edge: int):
    """The bench content geometry (321x481 demo aspect), scaled."""
    return (1, round(long_edge * 321 / 481), long_edge, 3)


def levels_for(long_edge: int) -> int:
    """Scale schedule 64,128,...,long_edge (must be 64 * 2^k)."""
    levels = 1
    while 2 << (5 + levels - 1) < long_edge:
        levels += 1
    if 2 << (4 + levels) != long_edge:
        raise ValueError(f"long edge must be 64*2^k, got {long_edge}")
    return levels


def report(long_edge: int, params, remat: bool = False) -> dict:
    cfg = StrotssConfig(levels=levels_for(long_edge), remat=remat)
    spec = spec_from_config(cfg)
    cshape = content_shape_for(long_edge)
    sshape = (1, 1600, 1200, 3)  # bundled style geometry
    programs = precompile_scales(cfg, spec, params, cshape, sshape)
    rows = []
    for key in sorted(programs._futs):
        co = programs.get(key)
        if co is None:
            rows.append({"scale": cfg.scale_sizes()[key[0]], "error":
                         "compile failed (exceeds device memory?)"})
            continue
        ma = co.memory_analysis()
        rows.append({
            "scale": cfg.scale_sizes()[key[0]],
            "args_mb": round(ma.argument_size_in_bytes / MB, 1),
            "temp_mb": round(ma.temp_size_in_bytes / MB, 1),
            "out_mb": round(ma.output_size_in_bytes / MB, 1),
        })
        print(f"#   {long_edge}px{' remat' if remat else ''} run, "
              f"scale {rows[-1]['scale']:>5}px: "
              f"args {rows[-1]['args_mb']:>8} MB  temp "
              f"{rows[-1]['temp_mb']:>8} MB  out {rows[-1]['out_mb']:>7} MB",
              file=sys.stderr)
    return {"long_edge": long_edge, "programs": rows}


def batch_report(batch: int, params) -> dict:
    """Planned memory of the BATCHED finest-scale (512px) chunk program —
    the sweet-spot evidence: B=8's temp sits well inside HBM, B=16's
    approaches it (and measured 4.20 s/image vs B=8's 3.75)."""
    import jax.numpy as jnp

    from strotss_tpu.parallel.batch import (
        prepare_scale_batch,
        run_chunk_batch,
    )
    from strotss_tpu.solve import (
        _SRC_TAG_DIM,
        resize_max_hw,
        spec_from_config,
    )

    cfg = StrotssConfig()
    spec = spec_from_config(cfg, batched=True)
    aval = jax.ShapeDtypeStruct
    cshape = content_shape_for(512)
    chw = resize_max_hw(cshape[1], cshape[2], 512)
    shw = resize_max_hw(400, 300, 512)
    prep = jax.eval_shape(
        prepare_scale_batch, spec, "last", chw, shw, cfg.pyramid_levels,
        None, jax.tree.map(lambda a: aval(a.shape, a.dtype), params),
        aval((batch,) + cshape[1:], jnp.float32),
        aval((batch, 400, 300, 3), jnp.float32),
        aval((batch,) + cshape[1:], jnp.float32),
        aval((batch, 2), jnp.uint32), aval((), jnp.float32),
    )
    pyramid, content_feats, style_targets, _, opt_state = prep
    lo = run_chunk_batch.trace(
        spec, cfg.log_every, None,
        jax.tree.map(lambda a: aval(a.shape, a.dtype), params),
        content_feats, style_targets, None, None, pyramid, opt_state,
        aval((batch, 2), jnp.uint32), aval((batch,), jnp.float32),
        aval((), jnp.float32), aval((_SRC_TAG_DIM,), jnp.float32),
    ).lower()
    ma = lo.compile().memory_analysis()
    row = {"batch": batch,
           "args_mb": round(ma.argument_size_in_bytes / MB, 1),
           "temp_mb": round(ma.temp_size_in_bytes / MB, 1)}
    print(f"#   batched 512px chunk, B={batch}: args {row['args_mb']} MB  "
          f"temp {row['temp_mb']} MB", file=sys.stderr)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--long_edges", type=str, default="512,1024,2048")
    ap.add_argument("--batches", type=str, default="",
                    help="also report the batched 512px chunk program at "
                         "these batch sizes, e.g. 8,16")
    ap.add_argument("--run", action="store_true",
                    help="execute the largest resolution end-to-end")
    ap.add_argument("--remat", action="store_true",
                    help="measure with cfg.remat (recomputed activations)")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    edges = [int(x) for x in args.long_edges.split(",")]
    cfg0 = StrotssConfig()
    params = load_vgg_params(cfg0.vgg_type, cfg0.use_keras_weight)
    out = {"device": str(jax.devices()[0].device_kind),
           "remat": args.remat,
           "reports": [report(e, params, args.remat) for e in edges]}
    if args.batches:
        out["batched_512"] = [batch_report(int(b), params)
                              for b in args.batches.split(",")]

    if args.run:
        e = max(edges)
        cshape = content_shape_for(e)
        content = synth_image(cshape[1], cshape[2], 1)
        style = synth_image(1600, 1200, 2)
        cfg = StrotssConfig(levels=levels_for(e), remat=args.remat)
        t0 = time.perf_counter()
        img, info = stylize_single(content, style, cfg, params)
        jax.block_until_ready(img)
        out["run"] = {"long_edge": e,
                      "seconds": round(time.perf_counter() - t0, 2),
                      "loss": float(info["scales"][-1]["loss"])}
        print(f"# {e}px full run: {out['run']['seconds']}s "
              f"loss={out['run']['loss']:.4f}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
