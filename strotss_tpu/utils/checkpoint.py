"""Checkpoint / resume for the optimization state.

The reference has no checkpointing — state lives in-process and the output
is written once at the end (``/root/reference/run_strotss.py:157-161``; see
SURVEY.md §5). Here the full optimizer state (scale index, step count,
Laplacian-pyramid variables, RMSprop slots, PRNG key, α) is one small
pytree, saved atomically at every chunk boundary; an interrupted run
resumes bit-exactly (validated in tests/test_checkpoint.py).

Format: ``state.npz`` with order-flattened leaves + ``state.json`` with the
scalar metadata, a run *fingerprint* (config fields + input shapes), and a
pytree *structure digest* (treedef + per-leaf shape/dtype, hashed). Restores
fill a template pytree built by re-running the (deterministic) init path, so
no pickle is involved; a fingerprint or structure mismatch is rejected with
a clean error instead of silently restoring garbage.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_STATE_NPZ = "state.npz"
_STATE_META = "state.json"


def _flatten(tree) -> list:
    return jax.tree_util.tree_leaves(tree)


def structure_digest(tree) -> str:
    """Stable hash of the pytree structure + every leaf's shape/dtype.

    Guards against restoring into a template with the same *leaf count* but
    different shapes/treedef (e.g. a changed tap set with equal channel
    totals).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    desc = str(treedef) + "|" + ";".join(
        f"{tuple(np.shape(l))}:{np.asarray(l).dtype}" for l in leaves
    )
    return hashlib.sha256(desc.encode()).hexdigest()[:16]


def check_fingerprint(
    meta: Dict[str, Any], fingerprint: Dict[str, Any], directory: str
) -> None:
    """Refuse to resume when the run configuration changed.

    ``fingerprint`` is a JSON-compatible dict of everything that determines
    the optimization trajectory (config fields, input shapes, step spec).
    """
    saved = meta.get("fingerprint")
    if saved is None:
        # checkpoints written before fingerprints existed carry None —
        # treat as legacy: warn and rely on the structure-digest /
        # leaf-count guards in restore_state instead of refusing outright
        from strotss_tpu.utils.logging import logger

        logger.warning(
            f"Checkpoint at {directory} has no run fingerprint (written by "
            "an older version); resuming with structure-digest validation "
            "only."
        )
        return
    if saved != fingerprint:
        diffs = sorted(
            k
            for k in set(saved or {}) | set(fingerprint)
            if (saved or {}).get(k) != fingerprint.get(k)
        )
        raise ValueError(
            f"Checkpoint at {directory} was written by a different run "
            f"configuration (mismatched: {diffs or 'entire fingerprint'}). "
            "Delete the checkpoint directory to start fresh."
        )


def save_state(
    directory: str,
    scale_index: int,
    done_steps: int,
    alpha: float,
    pyramid,
    opt_state,
    key,
    fingerprint: Optional[Dict[str, Any]] = None,
    extras: Optional[Dict[str, Any]] = None,
) -> None:
    """Atomically persist the per-scale optimization state.

    ``extras``: named auxiliary arrays (e.g. the chunk's folded stylized
    image) — restored via :func:`restore_extras`. Resuming at a *completed*
    chunk boundary hands the saved image to the next scale verbatim, so the
    resumed run stays bit-exact even though no step program re-runs.
    """
    os.makedirs(directory, exist_ok=True)
    state = (pyramid, opt_state, key)
    leaves = _flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    for name, v in (extras or {}).items():
        arrays[f"extra_{name}"] = np.asarray(v)
    meta = {
        "scale_index": int(scale_index),
        "done_steps": int(done_steps),
        # scalar (single / uniform batch) or per-pair list (batched runs
        # with heterogeneous alphas) — both JSON-native
        "alpha": (float(alpha) if np.ndim(alpha) == 0
                  else [float(a) for a in np.asarray(alpha)]),
        "n_leaves": len(leaves),
        "structure": structure_digest(state),
        "fingerprint": fingerprint,
    }
    # the authoritative meta rides INSIDE the npz (plain unicode array, no
    # pickle), so the whole checkpoint commits in the single os.replace
    # below — a crash between two separate file replaces could otherwise
    # leave a new state paired with stale metadata, and a resume would
    # silently re-run a chunk on the already-advanced state
    arrays["meta_json"] = np.asarray(json.dumps(meta))
    # suffix must end in .npz or np.savez silently writes to "<tmp>.npz"
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez(tmp, **arrays)
        os.replace(tmp, os.path.join(directory, _STATE_NPZ))
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    # human-readable mirror (and pre-upgrade reader compatibility); if a
    # crash lands between the two replaces, load_meta prefers the npz copy
    tmp_meta = os.path.join(directory, _STATE_META + ".tmp")
    with open(tmp_meta, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_meta, os.path.join(directory, _STATE_META))


def restore_extras(directory: str) -> Dict[str, np.ndarray]:
    """Named auxiliary arrays saved alongside the state (may be empty)."""
    path = os.path.join(directory, _STATE_NPZ)
    if not os.path.exists(path):
        return {}
    data = np.load(path)
    return {
        f[len("extra_"):]: data[f] for f in data.files
        if f.startswith("extra_")
    }


def load_meta(directory: Optional[str]) -> Optional[Dict[str, Any]]:
    if not directory:
        return None
    # authoritative copy: the meta embedded in state.npz (written in the
    # same atomic replace as the leaves — cannot be torn from them)
    npz = os.path.join(directory, _STATE_NPZ)
    if os.path.exists(npz):
        try:
            data = np.load(npz)
            if "meta_json" in data.files:
                return json.loads(data["meta_json"].item())
        except Exception:
            pass  # unreadable npz → restore_state raises the clean error
    # legacy checkpoints (meta only in the sidecar)
    path = os.path.join(directory, _STATE_META)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def restore_state(directory: str, template: Tuple) -> Tuple:
    """Fill ``template = (pyramid, opt_state, key)`` with saved leaves.

    The saved structure digest must match the template's — a same-leaf-count
    but different-shape/treedef template (changed taps, pyramid depth...)
    raises instead of restoring garbage.
    """
    path = os.path.join(directory, _STATE_NPZ)
    try:
        data = np.load(path)
    except Exception as e:
        raise ValueError(
            f"Corrupt or unreadable checkpoint at {path}: {e}. "
            "Delete the checkpoint directory to restart from scratch."
        ) from e
    meta = load_meta(directory)
    if meta is not None and "structure" in meta:
        want = structure_digest(template)
        if meta["structure"] != want:
            raise ValueError(
                f"Checkpoint at {directory} has pytree structure "
                f"{meta['structure']} but this run expects {want} — "
                "config/shape mismatch with the saved run. Delete the "
                "checkpoint directory to restart from scratch."
            )
    leaves, treedef = jax.tree_util.tree_flatten(template)
    n_saved = sum(1 for f in data.files if f.startswith("leaf_"))
    saved = [data[f"leaf_{i}"] for i in range(n_saved)]
    if len(saved) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(saved)} leaves, expected {len(leaves)} — "
            "config/shape mismatch with the saved run"
        )
    new_leaves = [
        jnp.asarray(s).astype(l.dtype).reshape(l.shape)
        for s, l in zip(saved, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
