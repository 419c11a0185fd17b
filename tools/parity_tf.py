"""End-to-end loss-parity experiment vs the TF reference implementation.

Runs the reference's own modules (sampling, losses, pyramid, RMSprop loop —
imported from /root/reference, never copied) against our solver with
IDENTICAL injected VGG weights and matched config, and compares loss
trajectories. The two RNG streams differ (TF stateful ops vs JAX keys), so
equivalence is distributional: we compare the mean loss over the last K
steps, which averages out per-step sampling noise.

Usage:  python tools/parity_tf.py [--steps 60] [--scale 64] [--tail 15]
Writes a JSON report to tests/golden/parity_report.json.
"""

import argparse
import json
import os
import sys

os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

import numpy as np

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))


def synth(h, w, seed):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    for cell in (32, 8):
        base = rng.random((h // cell + 2, w // cell + 2, 3)).astype(np.float32)
        img += np.kron(base, np.ones((cell, cell, 1), np.float32))[:h, :w]
    return img / img.max()


def run_reference(content, style, params, scale, steps, alpha, lr, sample_size):
    """The reference's unmasked single-scale loop, built from ITS modules."""
    sys.path.insert(0, REF)
    from nn import losses as rl
    from nn import strotss_utils as ru
    from nn import utils as rutils
    import tensorflow as tf

    # weight-injected VGG16 feature extractor with the reference's taps and
    # 'norm'-mode preprocessing (nn/model.py:34-35,50-51)
    base = tf.keras.applications.VGG16(include_top=False, weights=None)
    for name, p in params.items():
        base.get_layer(name).set_weights(
            [np.asarray(p["kernel"]), np.asarray(p["bias"])]
        )
    taps = ["block1_conv1", "block1_conv2", "block2_conv1", "block2_conv2",
            "block3_conv1", "block3_conv2", "block3_conv3", "block4_conv3",
            "block5_conv3"]
    net = tf.keras.Model(base.input, [base.get_layer(t).output for t in taps])
    mean = tf.constant([0.485, 0.456, 0.406], tf.float32)[None, None, None]
    std = tf.constant([0.229, 0.224, 0.225], tf.float32)[None, None, None]

    def vgg(x):
        return net((x - mean) / std)

    c = rutils.resize(tf.constant(content[None]), scale)
    s = rutils.resize(tf.constant(style[None]), scale)

    lap = ru.make_laplacian(c)
    stylized = lap + tf.reduce_mean(s, axis=(1, 2), keepdims=True)
    variables = [tf.Variable(p) for p in ru.make_laplacian_pyramid(stylized)]

    sampling = ru.Sampling(sample_size)
    denom = 2.0 + alpha + 1.0 / max(alpha, 1.0)
    inv_alpha = 1.0 / max(alpha, 1.0)

    content_feat = [c] + vgg(c)
    style_feat = [s] + vgg(s)
    style_target = sampling(style_feat)

    opt = tf.keras.optimizers.RMSprop(rho=0.99, epsilon=1e-8, learning_rate=lr)

    @tf.function
    def train_step():
        with tf.GradientTape() as tape:
            img = ru.fold_laplacian_pyramid(variables)
            pred = [img] + vgg(img)
            c_feat, p_feat = sampling.bilinear(content_feat, pred)
            loss_c = rl.self_similarity(p_feat, c_feat)
            l_m = rl.moment_matching(style_target, p_feat)
            l_remd = rl.relaxed_emd(style_target, p_feat)
            l_pal = rl.relaxed_emd(
                ru.convert_rgb_to_yuv(style_target),
                ru.convert_rgb_to_yuv(p_feat),
                distance="both",
            )
            loss_s = l_m + l_remd + inv_alpha * l_pal
            loss = (alpha * loss_c + loss_s) / denom
        grads = tape.gradient(loss, variables)
        return loss, loss_c, loss_s, grads

    losses = []
    for _ in range(steps):
        loss, lc, ls, grads = train_step()
        opt.apply_gradients(zip(grads, variables))
        losses.append([float(loss), float(lc), float(ls)])
    return np.asarray(losses)


def run_ours(content, style, params, scale, steps, lr, sample_size,
             dtype="float32", seed=0):
    import jax.numpy as jnp

    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.solve import stylize_single

    cfg = StrotssConfig(
        levels=1,
        max_iter=steps,
        log_every=1,
        lr=lr,
        sample_size=sample_size,
        compute_dtype=dtype,
        use_pallas=False,
        max_size=scale,
        seed=seed,
    )
    traj = []

    def cb(scl, done, total, metrics):
        traj.append([metrics["loss"], metrics["loss_c"], metrics["loss_s"]])

    stylize_single(
        jnp.asarray(content)[None], jnp.asarray(style)[None], cfg, params,
        progress_cb=cb,
    )
    return np.asarray(traj)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--scale", type=int, default=64)
    ap.add_argument("--tail", type=int, default=15)
    ap.add_argument("--sample_size", type=int, default=1024)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--seed", type=int, default=0,
                    help="our-side PRNG seed; the two RNG streams differ "
                         "anyway, so seed sweeps quantify the sampling-"
                         "noise floor of the tail-mean comparison")
    ap.add_argument("--reuse_reference", type=str, default=None,
                    help="path to a previous parity_report.json whose "
                         "reference numbers (same config) should be reused")
    args = ap.parse_args()

    from strotss_tpu.models.weights import random_params

    params = random_params("16", 0)
    content = synth(96, 80, 1)
    style = synth(88, 104, 2)
    alpha, lr = 16.0, 2e-3

    ours = run_ours(content, style, params, args.scale, args.steps, lr,
                    args.sample_size, args.dtype, args.seed)
    prev = None
    if args.reuse_reference:
        with open(args.reuse_reference) as f:
            prev = json.load(f)
        assert prev["steps"] == args.steps and prev["tail"] == args.tail, (
            "reference report config mismatch")
        ref = None
    else:
        ref = run_reference(content, style, params, args.scale, args.steps,
                            alpha, lr, args.sample_size)

    report = {"steps": args.steps, "scale": args.scale, "tail": args.tail,
              "ours_dtype": args.dtype}
    for idx, name in enumerate(["loss", "loss_c", "loss_s"]):
        r = (prev[name]["reference"] if prev is not None
             else float(ref[-args.tail:, idx].mean()))
        o = float(ours[-args.tail:, idx].mean())
        report[name] = {
            "reference": r,
            "ours": o,
            "rel_diff": abs(o - r) / max(abs(r), 1e-9),
        }
    if ref is not None:
        report["ref_first_last"] = [float(ref[0, 0]), float(ref[-1, 0])]
    report["ours_first_last"] = [float(ours[0, 0]), float(ours[-1, 0])]

    suffix = "" if args.dtype == "float32" else f"_{args.dtype}"
    if args.seed:
        suffix += f"_seed{args.seed}"  # don't clobber the canonical report
    out = os.path.join(HERE, "..", "tests", "golden",
                       f"parity_report{suffix}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
