"""Sample-axis-sharded transport losses (shard_map + ICI collectives).

For high-res configs the REMD cost matrix is N x M with N, M ≫ 1024; even
tiled, a single chip eventually runs out of FLOPs. This module shards the
*style sample* axis (M) of the transport across a mesh axis: every device
keeps the full prediction sample block (N is modest) and a 1/p shard of the
style samples, computes its local distance block, and reduces:

- row minima: local (N,) minima → ``all_gather`` over the axis → min over
  the gathered axis (differentiable: the cotangent routes to the winning
  shard, unlike ``lax.pmin``).
- column minima: each shard's column minima are already complete (columns
  are sharded); the global mean is a ``psum`` of local sums / M.

Communication per step: one (p, N) all-gather + one scalar psum on ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from strotss_tpu.ops.losses import dist_metrics


def _remd_local(x, y_shard, distance, axis_name, m_total):
    c = dist_metrics[distance](x, y_shard)
    row_local = jnp.min(c, axis=1)  # (N,)
    col_local = jnp.min(c, axis=0)  # (M/p,)
    rows = jax.lax.all_gather(row_local, axis_name)  # (p, N)
    row_min = jnp.min(rows, axis=0)
    r_x = jnp.mean(row_min)
    r_y = jax.lax.psum(jnp.sum(col_local), axis_name) / m_total
    return jnp.maximum(r_x, r_y)


def relaxed_emd_sharded(
    x: jnp.ndarray,
    y: jnp.ndarray,
    mesh: Mesh,
    distance: str = "cosine",
    axis: str = "sample",
) -> jnp.ndarray:
    """REMD with ``y`` sharded over ``mesh`` axis ``axis``.

    Matches ``strotss_tpu.ops.losses.relaxed_emd`` exactly (same floors and
    reductions), validated in tests on an 8-device CPU mesh.
    """
    m_total = y.shape[0]
    fn = jax.shard_map(
        partial(
            _remd_local,
            distance=distance,
            axis_name=axis,
            m_total=m_total,
        ),
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
        # the value IS replicated (all_gather + psum reductions) but the
        # static replication checker can't infer it through all_gather;
        # parity incl. grads is asserted in tests/test_parallel.py
        check_vma=False,
    )
    return fn(x.astype(jnp.float32), y.astype(jnp.float32))
