"""CLI surface parity + a tiny end-to-end run through main()."""

import os

import numpy as np
import pytest

from strotss_tpu.cli import build_parser


def test_parser_defaults():
    args = build_parser().parse_args(["c.jpg", "s.jpg"])
    assert args.content_path == "c.jpg" and args.style_path == "s.jpg"
    assert args.content_mask is None and args.style_mask is None
    assert args.max_size is None
    assert args.lr == 2e-3
    assert args.level == 4 and isinstance(args.level, int)  # ref bug fixed
    assert args.max_iter == 200
    assert args.alpha == 1.0
    assert args.use_keras_weight is False
    assert args.device_id == 0
    assert args.output_path == "output.jpg"


def test_parser_level_int():
    # the reference declared --level type=float and crashed on range();
    # passing it explicitly must work here
    args = build_parser().parse_args(["c.jpg", "s.jpg", "--level", "2"])
    assert args.level == 2


def test_mask_xor_rejected(tmp_path, rng):
    from PIL import Image

    from strotss_tpu.cli import main

    img = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
    cp = str(tmp_path / "c.png")
    Image.fromarray(img).save(cp)
    with pytest.raises(ValueError, match="both content and style masks"):
        main([cp, cp, "--content_mask", cp])


@pytest.mark.slow
def test_cli_end_to_end(tmp_path, rng):
    from PIL import Image

    from strotss_tpu.cli import main

    c = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    s = (rng.random((44, 36, 3)) * 255).astype(np.uint8)
    cp, sp = str(tmp_path / "c.png"), str(tmp_path / "s.png")
    op = str(tmp_path / "out.jpg")
    Image.fromarray(c).save(cp)
    Image.fromarray(s).save(sp)

    pd = str(tmp_path / "trace")
    rc = main([
        cp, sp, "-o", op,
        "--level", "1", "--max_iter", "2", "--log_every", "2",
        "--compute_dtype", "float32", "--no_pallas",
        "--taps", "block1_conv1",
        "--profile_dir", pd,  # the jax.profiler plumbing must not crash
    ])
    assert rc == 0
    assert os.path.exists(op)
    out = np.asarray(Image.open(op))
    assert out.ndim == 3 and out.shape[2] == 3
    # a trace capture landed (plugins/ tree with at least one event file)
    assert os.path.isdir(pd) and any(os.scandir(pd))


def test_parser_style2_defaults():
    # style_blend parses to None so main() can tell "not passed" (the
    # effective default 0.5 is applied there) from a typo'd lone flag
    args = build_parser().parse_args(["c.jpg", "s.jpg"])
    assert args.style2 is None and args.style_blend is None
    args = build_parser().parse_args(
        ["c.jpg", "s.jpg", "--style2", "t.jpg", "--style_blend", "0.25"]
    )
    assert args.style2 == "t.jpg" and args.style_blend == 0.25


def test_cli_style_blend_without_style2_errors(tmp_path, rng):
    """A lone --style_blend must error, not silently run single-style
    (ADVICE r4: a typo'd invocation dropped the blend with no warning)."""
    from PIL import Image

    from strotss_tpu.cli import main

    img = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
    cp = str(tmp_path / "c.png")
    Image.fromarray(img).save(cp)
    with pytest.raises(ValueError, match="requires --style2"):
        main([cp, cp, "--style_blend", "0.3"])


def test_cli_style_blend_out_of_range(tmp_path, rng):
    from PIL import Image

    from strotss_tpu.cli import main

    img = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
    cp = str(tmp_path / "c.png")
    Image.fromarray(img).save(cp)
    with pytest.raises(ValueError, match="style_blend"):
        main([cp, cp, "--style2", cp, "--style_blend", "1.5"])


def test_cli_styles_arg_errors_fail_fast():
    """--styles/--style_weights consistency errors fire BEFORE any image
    I/O: nonexistent paths still produce the ValueError (a load-first
    ordering would surface FileNotFoundError instead)."""
    from strotss_tpu.cli import main

    with pytest.raises(ValueError, match="requires --styles"):
        main(["no_c.png", "no_s.png", "--style_weights", "1", "2"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        main(["no_c.png", "no_s.png", "--styles", "x.png",
              "--style2", "y.png"])
    with pytest.raises(ValueError, match="needs 3 numbers"):
        main(["no_c.png", "no_s.png", "--styles", "a.png", "b.png",
              "--style_weights", "1", "2", "3", "4"])
    # the 2-style flags' own checks fire before I/O too
    with pytest.raises(ValueError, match="requires --style2"):
        main(["no_c.png", "no_s.png", "--style_blend", "0.3"])


def test_parser_styles_defaults():
    args = build_parser().parse_args(["c.jpg", "s.jpg"])
    assert args.styles is None and args.style_weights is None
    args = build_parser().parse_args(
        ["c.jpg", "s.jpg", "--styles", "a.jpg", "b.jpg",
         "--style_weights", "2", "1", "1"]
    )
    assert args.styles == ["a.jpg", "b.jpg"]
    assert args.style_weights == [2.0, 1.0, 1.0]


@pytest.mark.slow
def test_cli_three_styles_end_to_end(tmp_path, rng):
    """--styles blends N>2 styles through main() — the CLI reaches the
    same N-style solve path serve's 'styles' jobs use."""
    from PIL import Image

    from strotss_tpu.cli import main

    c = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    s1 = (rng.random((44, 36, 3)) * 255).astype(np.uint8)
    s2 = (rng.random((28, 52, 3)) * 255).astype(np.uint8)
    s3 = (rng.random((32, 40, 3)) * 255).astype(np.uint8)
    cp, s1p, s2p, s3p = (str(tmp_path / n)
                         for n in ("c.png", "s1.png", "s2.png", "s3.png"))
    op = str(tmp_path / "out.jpg")
    for a, p in ((c, cp), (s1, s1p), (s2, s2p), (s3, s3p)):
        Image.fromarray(a).save(p)

    rc = main([
        cp, s1p, "-o", op, "--styles", s2p, s3p,
        "--style_weights", "2", "1", "1",
        "--level", "1", "--max_iter", "4", "--log_every", "2",
        "--compute_dtype", "float32", "--no_pallas", "--sample_size", "64",
        "--taps", "block1_conv1",
    ])
    assert rc == 0
    out = np.asarray(Image.open(op))
    assert out.ndim == 3 and out.shape[2] == 3


@pytest.mark.slow
def test_cli_style_blend_end_to_end(tmp_path, rng):
    """--style2/--style_blend run the blended program through main();
    the test reuses the solve-level test shapes so the compiled multi
    program is shared with tests/test_multistyle.py."""
    from PIL import Image

    from strotss_tpu.cli import main

    c = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    s1 = (rng.random((44, 36, 3)) * 255).astype(np.uint8)
    s2 = (rng.random((28, 52, 3)) * 255).astype(np.uint8)
    cp, s1p, s2p = (str(tmp_path / n) for n in ("c.png", "s1.png", "s2.png"))
    op = str(tmp_path / "out.jpg")
    Image.fromarray(c).save(cp)
    Image.fromarray(s1).save(s1p)
    Image.fromarray(s2).save(s2p)

    rc = main([
        cp, s1p, "-o", op, "--style2", s2p, "--style_blend", "0.3",
        "--level", "1", "--max_iter", "4", "--log_every", "2",
        "--compute_dtype", "float32", "--no_pallas", "--sample_size", "64",
        "--taps", "block1_conv1",
    ])
    assert rc == 0
    out = np.asarray(Image.open(op))
    assert out.ndim == 3 and out.shape[2] == 3
