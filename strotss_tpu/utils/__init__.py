from strotss_tpu.utils.logging import logger, make_logger
from strotss_tpu.utils.timing import Timer

__all__ = ["logger", "make_logger", "Timer"]
