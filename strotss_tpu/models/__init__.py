from strotss_tpu.models.vgg import (
    STROTSS_DEFAULT_TAPS,
    VGGExtractor,
    vgg_apply,
    vgg_layer_names,
)
from strotss_tpu.models.weights import load_vgg_params

__all__ = [
    "STROTSS_DEFAULT_TAPS",
    "VGGExtractor",
    "vgg_apply",
    "vgg_layer_names",
    "load_vgg_params",
]
