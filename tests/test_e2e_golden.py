"""End-to-end golden: fixed seed + fixed weights => recorded loss.

The reference's only quality signal is a committed output image
(SURVEY.md §4); here the analogue is a recorded final loss for a small
deterministic run. Tolerance is loose enough to absorb backend float
differences (CPU vs TPU) but catches any semantic regression in the
sampling/loss/optimizer pipeline.
"""

import jax.numpy as jnp
import numpy as np

from strotss_tpu.config import StrotssConfig
from strotss_tpu.models.weights import random_params
from strotss_tpu.solve import stylize_single


def _inputs():
    rng = np.random.default_rng(42)
    content = jnp.asarray(rng.random((1, 48, 56, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, 52, 44, 3)), jnp.float32)
    return content, style


def test_e2e_recorded_loss():
    content, style = _inputs()
    cfg = StrotssConfig(
        levels=1, max_iter=10, log_every=10, sample_size=64,
        compute_dtype="float32", use_pallas=False, taps=("block1_conv1",),
        seed=7,
    )
    params = random_params("16", 0)
    _, info = stylize_single(content, style, cfg, params)
    loss = info["scales"][0]["loss"]
    import json
    import os

    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "e2e_loss.json"
    )
    if not os.path.exists(golden_path):
        # regeneration must be explicit: a missing/deleted fixture is a
        # FAILURE, or the test could never fail on a corrupted checkout
        if os.environ.get("STROTSS_REGEN_GOLDEN") == "1":
            with open(golden_path, "w") as f:
                json.dump({"final_loss": loss}, f)
            return
        raise AssertionError(
            f"golden fixture missing: {golden_path}; re-record it "
            "explicitly with STROTSS_REGEN_GOLDEN=1"
        )
    with open(golden_path) as f:
        golden = json.load(f)["final_loss"]
    assert abs(loss - golden) <= 0.02 * abs(golden) + 1e-4, (
        f"e2e loss drifted: {loss} vs recorded {golden}"
    )
