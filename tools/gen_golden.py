"""Generate golden parity values by *running* the TF reference implementation.

Writes ``tests/golden/*.npz`` consumed by the parity tests. This script
imports the reference package from ``/root/reference`` read-only and records
its outputs on fixed random inputs — no reference code is copied into this
repo. Run once on a machine with TensorFlow; the committed npz files make
the tests self-contained afterwards.
"""

import os
import sys

os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "..", "tests", "golden")
REF = "/root/reference"


def main():
    os.makedirs(GOLDEN, exist_ok=True)
    # import the reference modules FIRST: nn.rand sets TF threading options,
    # which fails once TF has executed any op.
    sys.path.insert(0, REF)
    from nn import losses as ref_losses  # noqa: E402
    from nn import strotss_utils as ref_utils  # noqa: E402
    import tensorflow as tf

    rng = np.random.default_rng(1234)

    # --- tf.image.resize parity table ------------------------------------
    img = rng.random((1, 37, 53, 3)).astype(np.float32)
    resize_out = {}
    for hw in [(18, 26), (74, 106), (7, 11), (64, 64), (19, 27)]:
        resize_out[f"r_{hw[0]}x{hw[1]}"] = tf.image.resize(
            img, hw, method="bilinear"
        ).numpy()
    np.savez(os.path.join(GOLDEN, "resize.npz"), img=img, **resize_out)

    # --- reference losses on fixed inputs ---------------------------------
    x = rng.standard_normal((96, 35)).astype(np.float32)
    y = rng.standard_normal((80, 35)).astype(np.float32)
    z = rng.standard_normal((96, 35)).astype(np.float32)
    xt, yt, zt = tf.constant(x), tf.constant(y), tf.constant(z)

    out = {
        "x": x,
        "y": y,
        "z": z,
        "cosine": ref_losses.cosine_distance(xt, yt).numpy(),
        "l2": ref_losses.l2_distance(xt, yt).numpy(),
        "remd_cosine": ref_losses.relaxed_emd(xt, yt, "cosine").numpy(),
        "remd_l2": ref_losses.relaxed_emd(xt, yt, "l2").numpy(),
        "remd_both": ref_losses.relaxed_emd(xt, yt, "both").numpy(),
        "selfsim": ref_losses.self_similarity(xt, zt).numpy(),
        "moments": ref_losses.moment_matching(xt, yt).numpy(),
    }
    np.savez(os.path.join(GOLDEN, "losses.npz"), **out)

    # --- laplacian pyramid parity -----------------------------------------
    im = rng.random((1, 45, 61, 3)).astype(np.float32)
    pyr = ref_utils.make_laplacian_pyramid(tf.constant(im), levels=5)
    fold = ref_utils.fold_laplacian_pyramid(pyr).numpy()
    np.savez(
        os.path.join(GOLDEN, "pyramid.npz"),
        im=im,
        fold=fold,
        **{f"lvl{i}": p.numpy() for i, p in enumerate(pyr)},
    )

    # --- yuv ---------------------------------------------------------------
    feat = rng.random((50, 7)).astype(np.float32)
    yuv = ref_utils.convert_rgb_to_yuv(tf.constant(feat)).numpy()
    np.savez(os.path.join(GOLDEN, "yuv.npz"), feat=feat, yuv=yuv)

    # --- keras RMSprop trajectory ------------------------------------------
    init = rng.standard_normal((6, 4)).astype(np.float32)
    var = tf.Variable(init)
    grads = rng.standard_normal((5, 6, 4)).astype(np.float32)
    opt = tf.keras.optimizers.RMSprop(rho=0.99, epsilon=1e-08, learning_rate=2e-3)
    traj = []
    for g in grads:
        opt.apply_gradients([(tf.constant(g), var)])
        traj.append(var.numpy().copy())
    np.savez(
        os.path.join(GOLDEN, "rmsprop.npz"),
        init=init,
        grads=grads,
        traj=np.stack(traj),
    )

    print("golden files written to", GOLDEN)


if __name__ == "__main__":
    main()
