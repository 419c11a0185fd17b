"""VGG weight acquisition, conversion, and caching.

The reference downloads third-party normalized VGG weights
(``vgg16_norm.h5`` from ``https://ppza53893.github.io/box/weights/``,
``/root/reference/nn/model.py:6,31-33``) or falls back to stock Keras
ImageNet weights. This build must also work fully offline, so weights are
resolved in order:

1. ``$STROTSS_TPU_WEIGHTS`` — explicit ``.npz`` or ``.h5`` path.
2. The local npz cache ``~/.cache/strotss_tpu/vgg{16,19}_{norm,imagenet}.npz``.
3. Any matching Keras ``.h5`` under ``~/.keras/models`` / ``~/.keras/datasets``
   (converted once, then cached as npz).
4. A network download if egress is available: the reference's normalized
   ``vgg{16,19}_norm.h5`` in default mode (plain urllib, bounded timeout),
   or the stock Keras ImageNet weights via ``tf.keras`` in keras mode.
5. **Deterministic random init** (He-normal, fixed seed) with a loud warning —
   the pipeline stays fully functional and benchmarkable; stylization
   quality then reflects random features rather than ImageNet features.

Param pytree layout: ``{layer_name: {'kernel': (3,3,cin,cout) f32,
'bias': (cout,) f32}}`` with Keras layer names (``block1_conv1``...).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from strotss_tpu.models.vgg import vgg_layer_channels, vgg_layer_names
from strotss_tpu.utils.logging import logger

Params = Dict[str, Dict[str, jnp.ndarray]]

_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "strotss_tpu")


def _cache_path(vgg_type: str, use_keras_weight: bool) -> str:
    tag = "imagenet" if use_keras_weight else "norm"
    return os.path.join(_CACHE_DIR, f"vgg{vgg_type}_{tag}.npz")


def save_npz(params: Params, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    flat = {}
    for name, p in params.items():
        flat[f"{name}.kernel"] = np.asarray(p["kernel"], dtype=np.float32)
        flat[f"{name}.bias"] = np.asarray(p["bias"], dtype=np.float32)
    np.savez(path, **flat)


def _load_npz(path: str, vgg_type: str) -> Params:
    data = np.load(path)
    params: Params = {}
    for name in vgg_layer_names(vgg_type):
        params[name] = {
            "kernel": jnp.asarray(data[f"{name}.kernel"]),
            "bias": jnp.asarray(data[f"{name}.bias"]),
        }
    return params


def _natural_key(s: str):
    """Digit-aware sort key: 'conv2d_2' < 'conv2d_10' (plain string sort
    puts _10 before _2, which scrambles Keras-3 layer order)."""
    import re

    # tag tokens so int-vs-str comparisons can never raise on odd names
    return [
        (0, int(t), "") if t.isdigit() else (1, 0, t)
        for t in re.split(r"(\d+)", s)
    ]


def _load_h5(path: str, vgg_type: str) -> Optional[Params]:
    """Convert a Keras-format VGG .h5 into our pytree.

    Tolerant to all three layouts seen in the wild:

    - Keras 2 / tf.keras ``model.save_weights``: ``model_weights`` root,
      per-layer groups holding ``kernel:0`` / ``bias:0`` datasets;
    - legacy Theano-era files: ``<name>_W`` / ``<name>_b``;
    - Keras 3 ``.weights.h5``: ``layers/conv2d_N/vars/{0,1}``.

    Each 4-D kernel is paired with the 1-D bias from the *same* h5 group —
    by uniqueness when the group holds exactly one length-matching 1-D
    dataset (Keras 2/3 per-layer groups), by ``<name>_W`` -> ``<name>_b``
    name matching when a flat legacy group holds many (VGG repeats channel
    counts 3x256/6x512, so "first length match" would silently pair
    ``conv3_2_W`` with ``conv3_1_b``). Layers are ordered by a digit-aware
    sort of their group names (h5 visits ``conv2d_10`` before ``conv2d_2``),
    and the resulting chain is validated against the exact VGG shape
    sequence — a file that doesn't match returns None rather than producing
    silently-wrong params.
    """
    try:
        import h5py
    except ImportError:
        return None
    pairs = []  # (group_name, kernel, bias)

    def visit(name, obj):
        if hasattr(obj, "shape") and obj.ndim == 4:
            parent = obj.parent
            cands = [
                (sname, sib)
                for sname, sib in parent.items()
                if (
                    hasattr(sib, "shape")
                    and sib.ndim == 1
                    and sib.shape[0] == obj.shape[-1]
                )
            ]
            bias = None
            if len(cands) == 1:
                bias = np.asarray(cands[0][1])
            else:
                # flat legacy layout: several same-length biases share the
                # group — only an exact name pairing is safe
                leaf = name.rsplit("/", 1)[-1]
                if leaf.endswith("_W"):
                    want = leaf[:-2] + "_b"
                    for sname, sib in cands:
                        if sname == want:
                            bias = np.asarray(sib)
                            break
            if bias is not None:
                pairs.append((name, np.asarray(obj), bias))

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        root.visititems(visit)

    pairs.sort(key=lambda t: _natural_key(t[0]))
    names = vgg_layer_names(vgg_type)
    chans = vgg_layer_channels(vgg_type)
    if len(pairs) < len(names):
        return None
    params: Params = {}
    cin = 3
    for name, (gname, k, b) in zip(names, pairs):
        if (
            k.shape[-1] != chans[name]
            or k.shape[-2] != cin
            or k.shape[:2] != (3, 3)
            or b.shape[0] != chans[name]
        ):
            logger.warning(
                f"h5 layer shape mismatch at {name} "
                f"(expect (3,3,{cin},{chans[name]})): {k.shape}/{b.shape} "
                f"from '{gname}'; skipping this weight file"
            )
            return None
        params[name] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
        cin = chans[name]
    return params


def params_from_keras_model(model, vgg_type: str) -> Params:
    """Extract our param pytree from a live tf.keras VGG model."""
    params: Params = {}
    for name in vgg_layer_names(vgg_type):
        k, b = model.get_layer(name).get_weights()
        params[name] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
    return params


def random_params(vgg_type: str = "16", seed: int = 0) -> Params:
    """Deterministic He-normal init — offline fallback.

    Per-layer keys fold in the layer *index* (never ``hash(str)``: Python
    string hashing is salted per process, which silently breaks
    cross-process reproducibility).
    """
    params: Params = {}
    cin = 3
    key = jax.random.PRNGKey(seed)
    for idx, name in enumerate(vgg_layer_names(vgg_type)):
        cout = vgg_layer_channels(vgg_type)[name]
        kkey = jax.random.fold_in(key, idx)
        fan_in = 3 * 3 * cin
        std = float(np.sqrt(2.0 / fan_in))
        params[name] = {
            "kernel": jax.random.normal(kkey, (3, 3, cin, cout), jnp.float32) * std,
            "bias": jnp.zeros((cout,), jnp.float32),
        }
        cin = cout
    return params


# the reference's normalized-VGG weight host (nn/model.py:6,31-33)
_NORM_WEIGHT_URL = "https://ppza53893.github.io/box/weights/vgg{}_norm.h5"


def _try_norm_download(vgg_type: str) -> Optional[Params]:
    """Fetch the reference's ``vgg{16,19}_norm.h5`` when egress exists.

    The reference downloads this file on every default-mode run via
    ``tf.keras.utils.get_file`` (``/root/reference/nn/model.py:31-33``);
    here it is fetched once with a bounded timeout (offline boxes fail
    fast and fall through to the other sources), converted with
    ``_load_h5`` and cached as npz.
    """
    import urllib.request

    url = _NORM_WEIGHT_URL.format(vgg_type)
    dst = os.path.join(_CACHE_DIR, f"vgg{vgg_type}_norm.h5")
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        with urllib.request.urlopen(url, timeout=15) as r, open(
            dst + ".part", "wb"
        ) as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(dst + ".part", dst)
    except Exception as e:  # no egress — expected in this environment
        logger.info(
            f"Normalized VGG weights unavailable from {url} "
            f"({type(e).__name__})."
        )
        return None
    finally:
        if os.path.exists(dst + ".part"):
            os.remove(dst + ".part")
    p = _load_h5(dst, vgg_type)
    if p is None:
        logger.warning(f"Downloaded {dst} but could not parse it.")
    return p


def _try_keras_download(vgg_type: str) -> Optional[Params]:
    try:
        import tensorflow as tf  # noqa: F401

        cls = (
            tf.keras.applications.VGG16
            if vgg_type == "16"
            else tf.keras.applications.VGG19
        )
        model = cls(include_top=False, weights="imagenet")
        return params_from_keras_model(model, vgg_type)
    except Exception as e:  # offline / no TF — expected in this environment
        logger.info(f"Keras ImageNet weights unavailable ({type(e).__name__}).")
        return None


def load_vgg_params(vgg_type: str = "16", use_keras_weight: bool = False) -> Params:
    vgg_type = str(vgg_type)

    env = os.environ.get("STROTSS_TPU_WEIGHTS")
    if env and os.path.exists(env):
        if env.endswith(".npz"):
            return _load_npz(env, vgg_type)
        p = _load_h5(env, vgg_type)
        if p is not None:
            return p
        logger.warning(f"Could not parse STROTSS_TPU_WEIGHTS={env}")

    cache = _cache_path(vgg_type, use_keras_weight)
    if os.path.exists(cache):
        return _load_npz(cache, vgg_type)
    if os.path.exists(cache + ".random.npz"):
        logger.warning(
            "Using cached RANDOM-init VGG weights (no pretrained weights "
            "available offline)."
        )
        return _load_npz(cache + ".random.npz", vgg_type)

    keras_home = os.path.join(os.path.expanduser("~"), ".keras")
    candidates = []
    for sub in ("models", "datasets"):
        d = os.path.join(keras_home, sub)
        if os.path.isdir(d):
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".h5") and f"vgg{vgg_type}" in fn.lower():
                    # the two weight modes must never cross: default mode
                    # wants ONLY the normalized-VGG file, keras mode must
                    # NEVER pick it up (same architecture, so it would
                    # parse fine, run under the wrong preprocessing, and
                    # poison the per-mode npz cache)
                    if ("norm" in fn.lower()) != (not use_keras_weight):
                        continue
                    candidates.append(os.path.join(d, fn))
    for path in candidates:
        p = _load_h5(path, vgg_type)
        if p is not None:
            logger.info(f"Converted VGG weights from {path}")
            save_npz(p, cache)
            return p

    # network download, matching the reference's two weight modes: default
    # mode fetches the normalized STROTSS weights (nn/model.py:31-33),
    # keras mode the stock ImageNet weights (nn/model.py:36-38)
    p = (
        _try_keras_download(vgg_type)
        if use_keras_weight
        else _try_norm_download(vgg_type)
    )
    if p is not None:
        save_npz(p, cache)
        return p

    logger.warning(
        f"No pretrained VGG{vgg_type} weights found (offline?). Falling back "
        "to deterministic random init — stylization quality will not match "
        "ImageNet-feature STROTSS. Provide weights via $STROTSS_TPU_WEIGHTS."
    )
    params = random_params(vgg_type, seed=0)
    save_npz(params, _cache_path(vgg_type, use_keras_weight) + ".random.npz")
    return params
