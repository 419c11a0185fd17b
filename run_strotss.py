#!/usr/bin/env python
"""Drop-in entry point matching the reference invocation:

    python run_strotss.py <content> <style> [flags]

Thin shim over :mod:`strotss_tpu.cli` (same flags, same defaults, same log
messages as ``/root/reference/run_strotss.py:164-180``).
"""

import sys

from strotss_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
