"""Fail-fast validation of the public API's array inputs.

The reference validates ranks at its utility boundary
(``/root/reference/nn/utils.py:22-30``: rank-3/4 checks with clear
messages). Mis-shaped inputs here would otherwise surface as opaque shape
errors deep inside a jit trace (or, worse, trace successfully with wrong
semantics — e.g. an HWC image silently treated as a batch of H images), so
``stylize`` / ``stylize_batch`` check shapes and dtypes up front and raise
``ValueError`` with the expected layout spelled out.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _shape_dtype(x):
    return tuple(np.shape(x)), np.asarray(x).dtype if not hasattr(
        x, "dtype"
    ) else x.dtype


def check_image(name: str, x, batched: bool = False) -> None:
    """``x`` must be (1, H, W, 3) — or (B, H, W, 3) with ``batched`` — float."""
    shape, dtype = _shape_dtype(x)
    want = "(B, H, W, 3)" if batched else "(1, H, W, 3)"
    if len(shape) != 4 or shape[-1] != 3:
        hint = ""
        if len(shape) == 3 and shape[-1] == 3:
            hint = f" (got an unbatched HWC image — pass {name}[None])"
        raise ValueError(
            f"{name} must have shape {want}, got {shape}{hint}"
        )
    if not batched and shape[0] != 1:
        raise ValueError(
            f"{name} must have a singleton batch dim {want}, got {shape} — "
            "use strotss_tpu.parallel.stylize_batch for multiple pairs"
        )
    if batched and shape[0] < 1:
        raise ValueError(f"{name} batch dim must be >= 1, got {shape}")
    if not np.issubdtype(np.dtype(dtype), np.floating):
        raise ValueError(
            f"{name} must be floating point in [0, 1], got dtype {dtype}"
        )


def check_masks(
    content_masks,
    style_masks,
    region_valid=None,
    batched: bool = False,
    batch: Optional[int] = None,
) -> None:
    """Region stacks must be (K, H, W, 1) — (B, K, H, W, 1) batched — float,
    with matching region counts (regions are transport *pairs*,
    ``/root/reference/nn/strotss_utils.py:178-201``)."""
    if (content_masks is None) != (style_masks is None):
        missing = "style_masks" if style_masks is None else "content_masks"
        raise ValueError(
            f"content_masks and style_masks must be given together "
            f"({missing} is None) — each mask color defines a "
            "content-region -> style-region transport pair"
        )
    if content_masks is None:
        if region_valid is not None:
            raise ValueError(
                "region_valid was given without content_masks/style_masks; "
                "it weights mask REGIONS and would be silently ignored in "
                "an unmasked run — pass the region stacks or drop it"
            )
        return
    rank = 5 if batched else 4
    want = "(B, K, H, W, 1)" if batched else "(K, H, W, 1)"
    for name, m in (
        ("content_masks", content_masks), ("style_masks", style_masks)
    ):
        shape, dtype = _shape_dtype(m)
        if len(shape) != rank or shape[-1] != 1:
            raise ValueError(
                f"{name} must have shape {want}, got {shape}"
            )
        if not np.issubdtype(np.dtype(dtype), np.floating):
            raise ValueError(
                f"{name} must be a float 0/1 region indicator, got dtype "
                f"{dtype}"
            )
    cshape, sshape = np.shape(content_masks), np.shape(style_masks)
    k_axis = 1 if batched else 0
    if cshape[k_axis] != sshape[k_axis]:
        raise ValueError(
            f"content_masks and style_masks must pair region-for-region: "
            f"got {cshape[k_axis]} content regions vs {sshape[k_axis]} "
            "style regions"
        )
    if batched:
        if batch is not None and (cshape[0] != batch or sshape[0] != batch):
            raise ValueError(
                f"mask batch dims {cshape[0]}/{sshape[0]} do not match the "
                f"image batch {batch}"
            )
        if region_valid is not None:
            vshape = np.shape(region_valid)
            if tuple(vshape) != (cshape[0], cshape[1]):
                raise ValueError(
                    f"region_valid must have shape (B, K) = "
                    f"({cshape[0]}, {cshape[1]}), got {vshape}"
                )


def check_start_level(cfg) -> None:
    """``start_level`` must leave at least one scale to run."""
    if not 0 <= cfg.start_level < cfg.levels:
        raise ValueError(
            f"start_level must be in [0, levels), got start_level="
            f"{cfg.start_level} with levels={cfg.levels}"
        )
