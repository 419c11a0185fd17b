"""VGG extractor: structure, determinism, and activation parity vs tf.keras.

The parity test builds a Keras VGG16 with *random* weights, copies them into
our pytree, and compares tapped activations — this validates conv semantics
(SAME padding, pooling, preprocessing) without any network download.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from strotss_tpu.models import vgg as V
from strotss_tpu.models.weights import random_params, save_npz


def test_layer_names():
    names = V.vgg_layer_names("16")
    assert len(names) == 13
    assert names[0] == "block1_conv1" and names[-1] == "block5_conv3"
    assert len(V.vgg_layer_names("19")) == 16


def test_hypercolumn_channels():
    assert V.hypercolumn_channels() == 2179  # 3 + 64*2+128*2+256*3+512*2


def test_random_params_deterministic():
    p1 = random_params("16", 0)
    p2 = random_params("16", 0)
    np.testing.assert_array_equal(
        np.asarray(p1["block3_conv2"]["kernel"]),
        np.asarray(p2["block3_conv2"]["kernel"]),
    )


def test_npz_roundtrip(tmp_path):
    from strotss_tpu.models.weights import _load_npz

    p = random_params("16", 0)
    path = str(tmp_path / "w.npz")
    save_npz(p, path)
    p2 = _load_npz(path, "16")
    np.testing.assert_array_equal(
        np.asarray(p["block1_conv1"]["kernel"]),
        np.asarray(p2["block1_conv1"]["kernel"]),
    )


def test_tap_shapes(rng):
    params = random_params("16", 0)
    x = jnp.asarray(rng.random((1, 32, 48, 3)), jnp.float32)
    taps = ("block1_conv1", "block1_conv2", "block2_conv1")
    outs = V.vgg_apply(params, x, taps=taps)
    assert outs[0].shape == (1, 32, 48, 64)
    assert outs[1].shape == (1, 32, 48, 64)
    assert outs[2].shape == (1, 16, 24, 128)


def test_preprocess_modes():
    x = jnp.full((1, 2, 2, 3), 0.5, jnp.float32)
    n = np.asarray(V.preprocess(x, "norm"))
    np.testing.assert_allclose(
        n[0, 0, 0], (0.5 - np.array([0.485, 0.456, 0.406])) /
        np.array([0.229, 0.224, 0.225]), atol=1e-6)
    k = np.asarray(V.preprocess(x, "keras"))
    np.testing.assert_allclose(
        k[0, 0, 0], 127.5 - np.array([103.939, 116.779, 123.68]), atol=1e-4)


def test_grad_through_pool_bf16(rng):
    # regression: bf16 maxpool must stay on the differentiable
    # reduce_window_max path (a materialized -inf init value breaks it)
    import jax

    params = random_params("16", 0)
    x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)

    def f(img):
        outs = V.vgg_apply(
            params, img, taps=("block2_conv1",), compute_dtype=jnp.bfloat16
        )
        return jnp.sum(outs[0].astype(jnp.float32))

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_parity_vs_tf_keras(rng):
    tf = pytest.importorskip("tensorflow")

    x = rng.random((1, 36, 44, 3)).astype(np.float32)
    keras_vgg = tf.keras.applications.VGG16(
        include_top=False, weights=None, input_shape=(None, None, 3)
    )
    taps = ("block1_conv1", "block1_conv2", "block2_conv1", "block2_conv2")
    ref_model = tf.keras.Model(
        keras_vgg.input, [keras_vgg.get_layer(t).output for t in taps]
    )

    from strotss_tpu.models.weights import params_from_keras_model

    params = params_from_keras_model(keras_vgg, "16")
    # keras model consumes raw preprocessed input; feed both the same tensor
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    pre = (x - mean) / std
    ref_outs = [np.asarray(o) for o in ref_model(pre)]

    ours = V.vgg_apply(params, jnp.asarray(x), taps=taps, preprocess_mode="norm")
    for got, want, name in zip(ours, ref_outs, taps):
        np.testing.assert_allclose(
            np.asarray(got), want, atol=2e-4,
            err_msg=f"activation mismatch at {name}",
        )


@pytest.mark.slow
def test_load_h5_keras3_layout(rng, tmp_path):
    """_load_h5 parses a real Keras-3 ``.weights.h5`` (VERDICT r1 item 3b).

    Keras 3 names conv layers ``conv2d``..``conv2d_12`` — h5 visits
    ``conv2d_10`` *before* ``conv2d_2``, so this also locks in the
    digit-aware ordering fix.
    """
    tf = pytest.importorskip("tensorflow")

    keras_vgg = tf.keras.applications.VGG16(include_top=False, weights=None)
    path = str(tmp_path / "vgg16_rand.weights.h5")
    keras_vgg.save_weights(path)

    from strotss_tpu.models.weights import _load_h5, params_from_keras_model

    want = params_from_keras_model(keras_vgg, "16")
    got = _load_h5(path, "16")
    assert got is not None, "Keras-3 .weights.h5 failed to convert"
    for name in want:
        np.testing.assert_array_equal(
            np.asarray(got[name]["kernel"]), np.asarray(want[name]["kernel"]),
            err_msg=f"kernel mismatch at {name}",
        )
        np.testing.assert_array_equal(
            np.asarray(got[name]["bias"]), np.asarray(want[name]["bias"]),
            err_msg=f"bias mismatch at {name}",
        )


def test_load_h5_keras2_layout(rng, tmp_path):
    """_load_h5 parses the Keras-2 ``model_weights`` layout — the layout of
    the reference's ``vgg16_norm.h5`` (``nn/model.py:31-33``)."""
    h5py = pytest.importorskip("h5py")

    from strotss_tpu.models.vgg import vgg_layer_channels, vgg_layer_names
    from strotss_tpu.models.weights import _load_h5

    path = str(tmp_path / "vgg16_norm_style.h5")
    chans = vgg_layer_channels("16")
    want = {}
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")
        cin = 3
        for name in vgg_layer_names("16"):
            cout = chans[name]
            g = root.create_group(name).create_group(name)
            k = rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
            b = rng.standard_normal((cout,)).astype(np.float32)
            g.create_dataset("kernel:0", data=k)
            g.create_dataset("bias:0", data=b)
            want[name] = (k, b)
            cin = cout

    got = _load_h5(path, "16")
    assert got is not None
    for name, (k, b) in want.items():
        np.testing.assert_array_equal(np.asarray(got[name]["kernel"]), k)
        np.testing.assert_array_equal(np.asarray(got[name]["bias"]), b)


def test_load_h5_legacy_flat_layout(rng, tmp_path):
    """_load_h5 pairs biases by NAME in the flat legacy layout
    (``<name>_W``/``<name>_b`` datasets all in one group) — VGG repeats
    channel counts (3x256, 6x512), so a first-length-match search would
    silently pair e.g. ``conv3_2_W`` with ``conv3_1_b`` (ADVICE r2)."""
    h5py = pytest.importorskip("h5py")

    from strotss_tpu.models.vgg import vgg_layer_channels, vgg_layer_names
    from strotss_tpu.models.weights import _load_h5

    path = str(tmp_path / "vgg16_legacy.h5")
    chans = vgg_layer_channels("16")
    want = {}
    with h5py.File(path, "w") as f:
        cin = 3
        for name in vgg_layer_names("16"):
            cout = chans[name]
            k = rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
            # encode the layer name in the bias values so a wrong pairing
            # at a repeated channel count is detectable
            b = rng.standard_normal((cout,)).astype(np.float32)
            legacy = name.replace("block", "conv").replace("_conv", "_")
            f.create_dataset(f"{legacy}_W", data=k)
            f.create_dataset(f"{legacy}_b", data=b)
            want[name] = (k, b)
            cin = cout

    got = _load_h5(path, "16")
    assert got is not None, "legacy flat layout failed to convert"
    for name, (k, b) in want.items():
        np.testing.assert_array_equal(
            np.asarray(got[name]["kernel"]), k,
            err_msg=f"kernel mismatch at {name}",
        )
        np.testing.assert_array_equal(
            np.asarray(got[name]["bias"]), b,
            err_msg=f"bias mismatch at {name} (mispaired in flat layout)",
        )


def test_load_h5_rejects_wrong_shapes(tmp_path):
    """A same-layer-count file with a wrong channel chain is rejected."""
    h5py = pytest.importorskip("h5py")

    from strotss_tpu.models.vgg import vgg_layer_names
    from strotss_tpu.models.weights import _load_h5

    path = str(tmp_path / "bad.h5")
    with h5py.File(path, "w") as f:
        for i, name in enumerate(vgg_layer_names("16")):
            g = f.create_group(name)
            g.create_dataset("kernel:0", data=np.zeros((3, 3, 8, 8), np.float32))
            g.create_dataset("bias:0", data=np.zeros((8,), np.float32))
    assert _load_h5(path, "16") is None


def test_bf16_mixed_precision_policy():
    """bfloat16 mode computes block1 in f32 (taps included) and deeper
    blocks in bf16 — the mixed policy that keeps every loss component
    within 1% of the TF reference (docs/PARITY.md study)."""
    import jax
    import jax.numpy as jnp

    from strotss_tpu.models.vgg import vgg_apply
    from strotss_tpu.models.weights import random_params

    params = random_params("16", 0)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3))
    taps = ("block1_conv1", "block1_conv2", "block2_conv1")
    outs = vgg_apply(params, x, taps=taps, compute_dtype=jnp.bfloat16)
    assert [o.dtype for o in outs] == [
        jnp.float32, jnp.float32, jnp.bfloat16
    ]
    # and pure-f32 mode is untouched by the policy
    outs32 = vgg_apply(params, x, taps=taps, compute_dtype=jnp.float32)
    assert all(o.dtype == jnp.float32 for o in outs32)


def test_weight_modes_never_cross_h5_candidates(tmp_path, monkeypatch):
    """The ~/.keras scan must keep the two weight modes apart: default
    (STROTSS-normalized) mode considers ONLY 'norm' files, keras mode must
    NEVER pick one up — same architecture, so a norm file would parse
    fine, run under preprocessing it was never trained for, and poison
    the per-mode npz cache."""
    import os

    from strotss_tpu.models import weights as W

    home = tmp_path / "home"
    for sub in ("models", "datasets"):
        (home / ".keras" / sub).mkdir(parents=True)
    (home / ".keras" / "models" / "vgg16_norm.h5").write_bytes(b"x")
    (home / ".keras" / "models"
     / "vgg16_weights_tf_dim_ordering_tf_kernels_notop.h5").write_bytes(b"x")
    monkeypatch.setenv("HOME", str(home))
    monkeypatch.delenv("STROTSS_TPU_WEIGHTS", raising=False)
    monkeypatch.setattr(W, "_CACHE_DIR", str(tmp_path / "cache"))
    tried = []
    monkeypatch.setattr(
        W, "_load_h5", lambda path, vgg_type: tried.append(path) or None
    )
    monkeypatch.setattr(W, "_try_keras_download", lambda vgg_type: None)
    monkeypatch.setattr(W, "_try_norm_download", lambda vgg_type: None)

    W.load_vgg_params("16", use_keras_weight=True)
    assert tried and all(
        "norm" not in os.path.basename(p).lower() for p in tried
    ), f"keras mode considered a normalized-VGG file: {tried}"

    tried.clear()
    W.load_vgg_params("16", use_keras_weight=False)
    assert tried and all(
        "norm" in os.path.basename(p).lower() for p in tried
    ), f"default mode considered a non-normalized file: {tried}"
