"""strotss_tpu — a TPU-native STROTSS style-transfer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``interaction-lab-uh/STROTSS-tensorflow`` (Style Transfer by Relaxed Optimal
Transport and Self-Similarity, Kolkin et al., arXiv:1904.12785).

Design: everything on the compute path is a pure function compiled under
``jax.jit``; the per-scale optimization loop is a single ``lax.scan`` with the
RMSprop update fused inside (the reference round-trips gradients to the host
every step, ``/root/reference/run_strotss.py:147-148``). Sampling is
static-shape (Gumbel top-k instead of shuffle-and-truncate), the REMD cost
matrix has a fused Pallas kernel, and runs scale over a
``jax.sharding.Mesh`` three ways: pair batches over a ``data`` axis,
transport-loss samples over a ``sample`` axis, and a single high-res
stylization's conv stack over a ``spatial`` axis (GSPMD halo exchanges).
"""

from strotss_tpu.version import __version__
from strotss_tpu.config import StrotssConfig
from strotss_tpu.api import stylize

__all__ = ["__version__", "StrotssConfig", "stylize"]
