"""Configuration for the STROTSS TPU pipeline.

The reference exposes a flat 11-flag argparse namespace
(``/root/reference/run_strotss.py:164-178``); here the same knobs live in a
dataclass so the library API is usable without the CLI, plus TPU-specific
knobs (compute dtype, scan chunking, profiling) that have no reference
counterpart.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class StrotssConfig:
    """All knobs for one stylization run.

    Reference-parity fields (same defaults as ``run_strotss.py:164-178``):

    - ``lr``: RMSprop learning rate (``--lr``, default 2e-3).
    - ``levels``: number of coarse-to-fine scales (``--level``; the reference
      declares it ``type=float`` which crashes when passed explicitly — fixed
      to int here).
    - ``max_iter``: optimizer steps per scale (``--max_iter``, 200).
    - ``alpha``: content weight (``--alpha``, 1.0); internally scaled x16
      (x3500 more under keras weights) like ``run_strotss.py:65``.
    - ``max_size``: aspect-preserving cap on the longest input edge.
    - ``use_keras_weight``: stock-Keras-ImageNet VGG weights + caffe
      preprocessing instead of the normalized STROTSS weights.
    """

    # --- reference CLI surface -------------------------------------------
    lr: float = 2e-3
    levels: int = 4
    max_iter: int = 200
    alpha: float = 1.0
    max_size: Optional[int] = None
    use_keras_weight: bool = False

    # --- model -----------------------------------------------------------
    vgg_type: str = "16"  # '16' or '19', reference nn/model.py:21-25
    #: VGG tap layers; None = the 9 STROTSS defaults (nn/model.py:7-15).
    taps: Optional[tuple] = None
    sample_size: int = 1024  # reference run_strotss.py:68
    pyramid_levels: int = 5  # reference nn/strotss_utils.py:149

    # --- TPU-native knobs (new capabilities) ------------------------------
    #: skip the coarsest ``start_level`` scales of the schedule, running
    #: only scales ``start_level..levels-1`` (alpha still halves per
    #: skipped scale, so each executed scale sees exactly the alpha a full
    #: run would give it). With ``init_image`` this is a REFINEMENT pass:
    #: e.g. ``levels=4, start_level=3, init_image=prev_output`` polishes
    #: an existing result with extra 512px-only steps at the full run's
    #: final-scale settings. Without an init the first executed scale
    #: seeds from the plain content.
    start_level: int = 0
    #: rematerialize the VGG forward in the backward pass
    #: (``jax.checkpoint``): recompute conv activations instead of storing
    #: them — one extra forward of FLOPs for a ~3x smaller live-activation
    #: footprint. OFF for the default workload (512px fits comfortably and
    #: remat costs step time); turn ON to push past the single-chip
    #: resolution ceiling (2048px without, measured — see
    #: ``tools/mem_report.py --remat`` and docs/DEPLOY.md).
    remat: bool = False
    #: dtype for the VGG conv path; losses always run in float32.
    compute_dtype: str = "bfloat16"
    #: steps per jitted scan chunk. Default = one chunk per scale (per-step
    #: metrics are replayed from the chunk's metric block anyway, and every
    #: extra chunk size is another compiled program — expensive on a
    #: remote-compile backend). Set lower for finer checkpoint/snapshot
    #: cadence or mid-scale progress liveness.
    log_every: int = 200
    #: base PRNG seed (reference nn/rand.py seeds everything to 0).
    seed: int = 0
    #: AOT-compile all per-scale programs up front with overlapped
    #: compile/cache round-trips (see solve.precompile_scales) instead of
    #: compiling lazily (serially) at each scale's first step.
    precompile: bool = True
    #: use the fused Pallas REMD kernel where shapes allow.
    use_pallas: bool = True
    #: VGG block1 implementation: 'auto' (= 'xla'), 'xla', or 'pallas'.
    #: The fused Pallas block1 kernel exists and is numerically verified,
    #: but measured SLOWER than the lax convs on v5e (its Mosaic relayouts
    #: exceed the XLA conv emitter's own overhead — docs/MXU.md); it stays
    #: an explicit opt-in for future hardware/compiler re-evaluation.
    block1_impl: str = "auto"
    #: optional jax.profiler trace directory.
    profile_dir: Optional[str] = None
    #: dump intermediate stylized images every N steps (0 = off).
    save_every: int = 0
    #: directory for chunk-boundary checkpoints; an existing state there
    #: resumes the run bit-exactly (new capability; reference has none).
    checkpoint_dir: Optional[str] = None
    #: use Sinkhorn-iterated full OT instead of REMD for the style loss.
    use_sinkhorn: bool = False
    sinkhorn_lambda: float = 10.0
    sinkhorn_iters: int = 30
    #: shard the feature-sample axis of the transport losses over the
    #: 'sample' axis of the mesh passed to stylize/stylize_batch — the
    #: N² distance matrices are then partitioned across chips by XLA
    #: (for high-res / large-sample_size configs).
    shard_samples: bool = False
    #: shard the IMAGE HEIGHT over the 'spatial' axis of the mesh passed
    #: to stylize — the VGG conv stack (forward AND backward, the
    #: dominant cost at high resolution) is then partitioned across chips
    #: by XLA/GSPMD with automatic halo exchanges over ICI, scaling a
    #: SINGLE high-res stylization beyond one chip. Composes with
    #: shard_samples on a 2-D ('spatial', 'sample') mesh. Single-pair
    #: runs only (``stylize``); the batched path scales over 'data'.
    shard_spatial: bool = False

    def scale_sizes(self) -> list:
        """The coarse-to-fine long-edge schedule: 64, 128, 256, 512, ...

        Matches ``scl = 2 << (5 + i)`` at ``run_strotss.py:71``.
        """
        return [2 << (5 + i) for i in range(self.levels)]

    def initial_alpha(self) -> float:
        """alpha * 16, x3500 in keras-weight mode (``run_strotss.py:65``)."""
        return self.alpha * 16.0 * (3500.0 if self.use_keras_weight else 1.0)
