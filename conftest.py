"""Root conftest: force CPU + an 8-device virtual mesh before JAX loads.

This is the standard JAX substitute for multi-chip CI
(``--xla_force_host_platform_device_count``), per SURVEY.md §4. The
persistent compilation cache makes repeated test runs cheap — XLA:CPU conv
compiles take ~20s each on this single-core box.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def pytest_configure(config):
    import jax

    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
