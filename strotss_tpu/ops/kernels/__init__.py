from strotss_tpu.ops.kernels.remd import relaxed_emd_pallas, remd_mins

__all__ = ["relaxed_emd_pallas", "remd_mins"]
