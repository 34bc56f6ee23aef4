"""Hardware-tier tests: run the Pallas kernels on a REAL TPU chip.

The main suite (tests/) pins the CPU backend for determinism and virtual
multi-device meshes; this directory is the complement — compiled-kernel
correctness on actual hardware. Run manually:

    PYTHONPATH=/root/repo:/root/.axon_site python -m pytest tpu_tests/ -q

Everything here is skipped automatically when no TPU backend is available.
"""

import jax
import pytest


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def pytest_collection_modifyitems(config, items):
    if not on_tpu():
        marker = pytest.mark.skip(reason="no TPU backend available")
        for item in items:
            item.add_marker(marker)


jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
