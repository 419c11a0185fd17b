"""Logging with the same surface as the reference.

Parity with ``/root/reference/nn/utils.py:9-19``: a module-global ``logger``
configured by ``make_logger(name)``, stdout handler, the same format string,
level INFO. Unlike the reference (which *rebinds* a module global, so
modules imported before ``make_logger`` keep logging through an unconfigured
logger), every module here shares one named logger object and
``make_logger`` configures it in place.
"""

from __future__ import annotations

import logging
import sys

_NAME = "STROTSS"

logger = logging.getLogger(_NAME)


def make_logger(name: str = _NAME) -> logging.Logger:
    """Attach the stdout handler + format to the shared logger."""
    global logger
    if name != _NAME:
        logger = logging.getLogger(name)
    if not logger.handlers:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(
            logging.Formatter(
                "%(asctime)s [%(levelname)s] %(name)s: %(message)s",
                "%Y-%m-%d %H:%M:%S",
            )
        )
        logger.addHandler(sh)
    logger.setLevel(logging.INFO)
    return logger


def route_to_stderr() -> logging.Logger:
    """Re-point the shared logger's stream handlers at stderr.

    Serving mode uses this: its stdout is the machine-readable JSONL
    results stream by default, and a single INFO line (weights loader,
    ``write_image``, warmup) interleaved into it would corrupt a
    consumer's parse. The CLI keeps the reference's stdout handler.
    """
    lg = make_logger()
    for h in lg.handlers:
        if isinstance(h, logging.StreamHandler):
            try:
                h.setStream(sys.stderr)
            except ValueError:
                # setStream flushes the OLD stream first; if that stream
                # is already closed (process re-daemonized, or a test
                # runner's capture torn down), swap without flushing
                h.stream = sys.stderr
    return lg
