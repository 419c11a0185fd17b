from strotss_tpu.ops import image, losses, sampling  # noqa: F401
