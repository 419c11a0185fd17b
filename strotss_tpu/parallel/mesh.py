"""Device-mesh helpers.

The reference is strictly single-device (``/root/reference/nn/utils.py:73-85``
pins one GPU). TPU-native scaling here has three axes:

- ``data``: embarrassingly-parallel content/style *pairs* (the dominant
  production axis — stylizations are independent).
- ``sample``: the feature-sample dimension of the transport losses, for
  high-res configs where N² cost matrices outgrow one chip's appetite
  (see ``strotss_tpu.parallel.transport``).
- ``spatial``: the image HEIGHT of a *single* stylization — GSPMD
  partitions the VGG conv stack (fwd+bwd, the dominant cost at high
  resolution) across chips with automatic halo exchanges
  (``config.shard_spatial``; constraint in ``solve``).

Collectives (halo ppermutes, psums) ride ICI within a slice; DCN is only
ever crossed by the ``data`` axis (independent work, no per-step traffic).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a Mesh over available devices.

    ``make_mesh()`` → 1-D 'data' mesh over every device;
    ``make_mesh((4, 2), ('data', 'sample'))`` → 2-D mesh.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding placing a leading batch axis on ``axis``, rest replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
