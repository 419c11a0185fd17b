"""Numerics shared by the Pallas kernels (remd / selfsim / sinkhorn /
block1).

The kernels must stay numerically matched to the XLA reference
implementations in :mod:`strotss_tpu.ops.losses` — the eps floors are
therefore imported from there (one source of truth; the reference sets
the same floors, ``/root/reference/nn/losses.py``), and the row-normalize
and Mosaic tile-padding helpers live here so a change cannot silently
drift one kernel apart from the others.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# canonical values live with the XLA loss implementations
from strotss_tpu.ops.losses import (  # noqa: F401
    _COLSUM_EPS,
    _L2DIST_EPS,
    _L2NORM_EPS,
)


def round_up(v: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``v`` (Mosaic tile padding)."""
    return -(-v // m) * m


def normalize_rows(x):
    """Row-L2-normalize with the shared eps floor.

    Returns ``(normalized, inverse_norms)`` — the inverse norms are reused
    by the kernels' custom VJPs.
    """
    sq = jnp.sum(x * x, axis=1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(sq, _L2NORM_EPS))
    return x * inv, inv
