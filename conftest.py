"""Root conftest: compile cache + an 8-device virtual CPU mesh on demand.

This environment force-registers the axon TPU backend at interpreter start
(sitecustomize), overriding ``JAX_PLATFORMS``/``XLA_FLAGS`` from the shell —
so the virtual multi-device mesh is configured through ``jax.config``
instead. Tests run on the default backend (the real TPU when present, which
also compiles convs ~30x faster than this box's single-core XLA:CPU);
mesh-sharding tests grab ``jax.devices('cpu')`` — 8 virtual devices — the
standard JAX substitute for multi-chip CI per SURVEY.md §4.
"""

import os


def pytest_configure(config):
    import jax

    # must precede first CPU-backend touch
    jax.config.update("jax_num_cpu_devices", 8)
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
