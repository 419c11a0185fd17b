"""Pure-functional VGG16/19 hypercolumn feature extractor.

TPU-native rewrite of the reference's Keras-based extractor
(``/root/reference/nn/model.py:17-55``): parameters are a plain pytree
(dict of ``{name: {'kernel','bias'}}``), the forward pass is
``lax.conv_general_dilated`` in NHWC with optional bfloat16 compute (conv
accumulation stays float32 via ``preferred_element_type``), and the network
is truncated at the deepest requested tap — the reference builds all of
VGG16 and discards the tail.

Tap semantics match Keras: a ``blockN_convM`` output is the *post-ReLU*
activation of that conv. Default taps (``nn/model.py:7-15``)::

    block1_conv1, block1_conv2, block2_conv1, block2_conv2,
    block3_conv1, block3_conv2, block3_conv3, block4_conv3, block5_conv3

Two preprocessing modes, as in the reference (``nn/model.py:30-38,50-51``):

- ``norm`` (default weights): ``(x - imagenet_mean) / imagenet_std`` on RGB
  in [0,1].
- ``keras``: caffe-style — scale to [0,255], RGB→BGR, subtract BGR means
  (what ``tf.keras.applications.vgg16.preprocess_input(x*255)`` does).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

STROTSS_DEFAULT_TAPS = (
    "block1_conv1",
    "block1_conv2",
    "block2_conv1",
    "block2_conv2",
    "block3_conv1",
    "block3_conv2",
    "block3_conv3",
    "block4_conv3",
    "block5_conv3",
)

# convs per block
_BLOCK_CONVS = {"16": (2, 2, 3, 3, 3), "19": (2, 2, 4, 4, 4)}
_BLOCK_WIDTHS = (64, 128, 256, 512, 512)

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)
_CAFFE_BGR_MEAN = (103.939, 116.779, 123.68)


def vgg_layer_names(vgg_type: str = "16") -> List[str]:
    """Ordered conv layer names: block1_conv1 ... block5_convN."""
    vgg_type = str(vgg_type)
    assert vgg_type in _BLOCK_CONVS, f"vgg_type must be 16 or 19, got {vgg_type}"
    names = []
    for b, n in enumerate(_BLOCK_CONVS[vgg_type], start=1):
        for c in range(1, n + 1):
            names.append(f"block{b}_conv{c}")
    return names


def vgg_layer_channels(vgg_type: str = "16") -> Dict[str, int]:
    return {
        name: _BLOCK_WIDTHS[int(name[5]) - 1] for name in vgg_layer_names(vgg_type)
    }


def hypercolumn_channels(
    taps: Sequence[str] = STROTSS_DEFAULT_TAPS, vgg_type: str = "16"
) -> int:
    """Total channels of image + tapped maps (2179 for the defaults)."""
    chans = vgg_layer_channels(vgg_type)
    return 3 + sum(chans[t] for t in taps)


def preprocess(x: jnp.ndarray, mode: str = "norm") -> jnp.ndarray:
    """Input normalization; ``x`` is NHWC RGB in [0, 1]."""
    if mode == "norm":
        mean = jnp.asarray(_IMAGENET_MEAN, x.dtype).reshape(1, 1, 1, 3)
        std = jnp.asarray(_IMAGENET_STD, x.dtype).reshape(1, 1, 1, 3)
        return (x - mean) / std
    if mode == "keras":
        bgr = (x * 255.0)[..., ::-1]
        return bgr - jnp.asarray(_CAFFE_BGR_MEAN, x.dtype).reshape(1, 1, 1, 3)
    raise ValueError(f"Unknown preprocess mode: {mode}")


def _conv_p(x: jnp.ndarray, kernel: jnp.ndarray, precision) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


def _conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    fast_f32: bool = False,
) -> jnp.ndarray:
    # float32 inputs get true-f32 math (HIGHEST — XLA:CPU otherwise drops
    # to bf16 fast paths). ``fast_f32`` (the mixed bf16 policy's block1)
    # keeps f32 operands/outputs but DEFAULT precision: bf16 multiply
    # passes with f32 accumulation and — the part that measurably matters
    # — f32 STORAGE of the tapped activations. The 600-step parity study
    # (docs/PARITY.md) shows f32-stored block1 cuts the content-loss
    # deviation from ~2.5% (all-bf16) to ~1.2±0.4%, while the conv's
    # internal pass count (1-pass vs 3-pass vs 6-pass vs HIGHEST) is
    # statistically indistinguishable there — sub-1e-3 feature
    # perturbations are absorbed bit-exactly by f32 optimizer-state
    # rounding — so the cheapest variant wins.
    # bf16 inputs ride the MXU bf16-in/bf16-out (the MXU accumulates in
    # f32 internally; an f32 output would break the conv transpose rule).
    if fast_f32:
        precision = jax.lax.Precision.DEFAULT
    else:
        precision = (
            jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    y = _conv_p(x, kernel, precision)
    y = y + bias.astype(y.dtype)
    return jnp.maximum(y, 0.0)


# A/B hook (read once at import; programs are retraced per process):
# 'reshape' = reshape+max over window axes, 'window' = lax.reduce_window.
# Forwards are identical; VJPs differ only on exact in-window ties (max
# splits the cotangent among ties; select-and-scatter picks one, which is
# TF MaxPoolGrad's routing) — post-ReLU, ties are either zeros (whose
# gradient the upstream ReLU mask kills regardless) or measure-zero float
# coincidences. Measured (v5e): in ISOLATION reduce_window edges ahead at
# the pool1 shape (fwd+bwd 2.86 vs 3.11 ms, tools/bench_pool.py; the old
# "select-and-scatter is catastrophic" claim no longer holds), but inside
# the FULL 512px step program it is slower (12.16 vs 11.76 ms/step,
# tools/trace_step.py) — reshape+max fuses into the surrounding conv
# dgrad pipeline where select-and-scatter cannot. reshape stays default.
_POOL_IMPL = os.environ.get("STROTSS_POOL_IMPL", "reshape")


def _maxpool(x: jnp.ndarray) -> jnp.ndarray:
    # Keras MaxPooling2D: 2x2 window, stride 2, VALID padding.
    if _POOL_IMPL == "window":
        # init MUST be the python scalar -inf: an array init becomes a
        # traced constant under lax.scan, defeating the reduce-window-max
        # pattern match and leaving the undifferentiable generic primitive
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    n, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2, :]
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))


def vgg_apply(
    params: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    taps: Sequence[str] = STROTSS_DEFAULT_TAPS,
    vgg_type: str = "16",
    preprocess_mode: str = "norm",
    compute_dtype: jnp.dtype = jnp.float32,
    block1_impl: str = "xla",
    block1_interpret: bool = False,
) -> List[jnp.ndarray]:
    """Run VGG on NHWC [0,1] RGB; return the tapped activations in order.

    Stops after the deepest tap. ``compute_dtype=bfloat16`` runs the conv
    stack on the MXU in bf16 with f32 accumulation.

    ``block1_impl='pallas'`` routes both block1 convs through the fused
    Pallas kernel (bf16 mixed policy, batch 1, both convs needed — falls
    back to lax convs otherwise). Same numerics family as the DEFAULT-
    precision f32 convs it replaces: bf16 MXU passes, f32 accumulation,
    f32-stored taps. Measured slower than the lax convs on v5e (see
    kernels/block1.py) — explicit opt-in only. ``block1_interpret`` is
    for CPU tests.
    """
    taps = list(taps)
    names = vgg_layer_names(vgg_type)
    deepest = max(names.index(t) for t in taps)

    # Mixed-precision policy under bfloat16: block1 runs with f32
    # operands and f32-STORED taps (DEFAULT-precision convs — see
    # _conv), deeper blocks in bf16. Block1's two taps are the highest-
    # resolution, largest-magnitude entries of the hypercolumn and
    # dominate the content (self-similarity) loss's sensitivity to
    # feature quantization: bf16-stored block1 converges ~2.5% off the
    # TF reference, f32-stored ~1.2±0.4% — the same band as float32
    # mode's own ~1.0% systematic offset (600-step study,
    # docs/PARITY.md). Costs ~13% step time over all-bf16.
    mixed = compute_dtype == jnp.bfloat16
    h = preprocess(x.astype(jnp.float32), preprocess_mode)
    if not mixed:
        h = h.astype(compute_dtype)
    outs: Dict[str, jnp.ndarray] = {}
    idx = 0
    n_blocks = len(_BLOCK_CONVS[vgg_type])
    # fused Pallas block1 (mixed policy, single image, deepest tap past
    # block1_conv2) — both taps in one kernel; opt-in, measured slower
    # than the lax convs (docs/MXU.md)
    fuse_b1 = (
        block1_impl == "pallas"
        and mixed
        and x.shape[0] == 1
        and deepest >= 1
    )
    for b in range(n_blocks):
        if mixed and b == 1:
            h = h.astype(compute_dtype)
        if b == 0 and fuse_b1:
            from strotss_tpu.ops.kernels.block1 import block1_pallas

            p1, p2 = params["block1_conv1"], params["block1_conv2"]
            t1, t2 = block1_pallas(
                h[0],
                p1["kernel"], p1["bias"], p2["kernel"], p2["bias"],
                # same convention as the remd/selfsim/sinkhorn kernels:
                # Mosaic only lowers on TPU, interpret everywhere else
                interpret=block1_interpret or jax.default_backend() != "tpu",
            )
            if "block1_conv1" in taps:
                outs["block1_conv1"] = t1[None]
            if "block1_conv2" in taps:
                outs["block1_conv2"] = t2[None]
            if deepest == 1:
                return [outs[t] for t in taps]
            h = _maxpool(t2[None])
            idx = 2
            continue
        for _ in range(_BLOCK_CONVS[vgg_type][b]):
            name = names[idx]
            p = params[name]
            dt = jnp.float32 if (mixed and b == 0) else compute_dtype
            h = _conv(h, p["kernel"].astype(dt), p["bias"],
                      fast_f32=(mixed and b == 0))
            if name in taps:
                outs[name] = h
            if idx == deepest:
                return [outs[t] for t in taps]
            idx += 1
        h = _maxpool(h)
    return [outs[t] for t in taps]


class VGGExtractor:
    """Convenience wrapper bundling params + settings; ``__call__`` mirrors
    the reference ``VGG.__call__`` contract (list of tap tensors;
    caller prepends the raw image to form the hypercolumn,
    ``run_strotss.py:95-96``)."""

    def __init__(
        self,
        layers: Optional[Sequence[str]] = None,
        vgg_type: str = "16",
        use_keras_weight: bool = False,
        compute_dtype=jnp.float32,
        params: Optional[dict] = None,
    ):
        from strotss_tpu.models.weights import load_vgg_params

        self.vgg_type = str(vgg_type)
        assert self.vgg_type in ("16", "19")
        self.taps = tuple(layers or STROTSS_DEFAULT_TAPS)
        self.preprocess_mode = "keras" if use_keras_weight else "norm"
        self.compute_dtype = compute_dtype
        self.params = (
            params
            if params is not None
            else load_vgg_params(self.vgg_type, use_keras_weight)
        )

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        return vgg_apply(
            self.params,
            x,
            taps=self.taps,
            vgg_type=self.vgg_type,
            preprocess_mode=self.preprocess_mode,
            compute_dtype=self.compute_dtype,
        )
