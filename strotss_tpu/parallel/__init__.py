from strotss_tpu.parallel.mesh import make_mesh
from strotss_tpu.parallel.batch import stylize_batch

__all__ = ["make_mesh", "stylize_batch"]
