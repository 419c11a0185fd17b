"""Region-mask partition semantics (reference nn/strotss_utils.py:178-201)."""

import numpy as np
import pytest

from strotss_tpu.ops.masks import partition_masks


def _mask_img(h, w, colors):
    """colors: list of ((slice_y, slice_x), (r,g,b))"""
    img = np.zeros((h, w, 3), np.uint8)
    for (sy, sx), c in colors:
        img[sy, sx] = c
    return img


def test_two_regions():
    c = _mask_img(200, 200, [
        ((slice(0, 100), slice(None)), (255, 0, 0)),
        ((slice(100, 200), slice(None)), (0, 255, 0)),
    ])
    s = _mask_img(200, 200, [
        ((slice(None), slice(0, 100)), (255, 0, 0)),
        ((slice(None), slice(100, 200)), (0, 255, 0)),
    ])
    cm, sm = partition_masks(c, s)
    assert cm.shape == (2, 200, 200, 1) and sm.shape == (2, 200, 200, 1)
    # paired: region k covers the same color in both
    total_c = np.asarray(cm).sum(axis=(1, 2, 3))
    assert (total_c == 20000).all()
    assert set(np.unique(np.asarray(cm))) == {0.0, 1.0}


def test_small_region_dropped():
    c = _mask_img(200, 200, [
        ((slice(0, 199), slice(None)), (255, 0, 0)),
        ((slice(199, 200), slice(0, 10)), (0, 0, 255)),  # 10 px < 10000
    ])
    cm, sm = partition_masks(c, c)
    assert cm.shape[0] == 1  # only the red region survives


def test_color_missing_in_style_dropped():
    c = _mask_img(200, 200, [((slice(None), slice(None)), (255, 0, 0))])
    s = _mask_img(200, 200, [((slice(None), slice(None)), (0, 255, 0))])
    with pytest.raises(Exception, match="No mask"):
        partition_masks(c, s)


def test_quantization():
    # colors snap to {0, 255} per channel: 200 -> 0, 255 -> 255
    c = np.full((200, 200, 3), 254, np.uint8)  # quantizes to 0
    c2 = np.full((200, 200, 3), 255, np.uint8)
    cm, sm = partition_masks(c, c)  # (0,0,0) region everywhere
    assert cm.shape[0] == 1 and np.asarray(cm).sum() == 200 * 200


def test_load_mask_max_size_floor_quantizes_like_reference(tmp_path):
    """Resized masks quantize the FLOAT resize output with ``// 255``
    (reference ``load_mask``: tf.image.resize on uint8 returns float,
    ``nn/strotss_utils.py:180-183``) — a boundary pixel interpolating to
    254.75 belongs to region 0, NOT 255. Rounding back to uint8 first
    (the old path) would put it in the 255 region (np.round(254.75)=255)
    and here would merge the whole mask into one region."""
    from PIL import Image

    from strotss_tpu.ops.masks import load_mask

    # 6x6, all 255 except column 1 = 254. Resized to 4x4 (factor 1.5),
    # output cols 0 and 1 interpolate to exactly 254.75 (weights .75/.25
    # at in-coords 0.25 and 1.75), cols 2-3 stay exactly 255.
    img = np.full((6, 6, 3), 255, np.uint8)
    img[:, 1] = 254
    p = tmp_path / "m.png"
    Image.fromarray(img).save(p)

    cm, sm = load_mask(str(p), str(p), max_size=4, sample_threth=1)
    assert cm.shape == (2, 4, 4, 1) and sm.shape == (2, 4, 4, 1)
    counts = sorted(np.asarray(cm).sum(axis=(1, 2, 3)).tolist())
    # region (0,0,0): interpolated cols 0-1; region (255,)*3: cols 2-3
    assert counts == [8.0, 8.0]
