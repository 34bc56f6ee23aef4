"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests follow the SURVEY.md section 4 strategy: an
8-device host-platform mesh stands in for a TPU slice
(XLA_FLAGS=--xla_force_host_platform_device_count=8).

This must run before jax is imported anywhere.
"""

import os

# fail HF hub lookups instantly: zero-egress means every from_pretrained
# network attempt otherwise burns ~45 s of DNS retries before the hash
# fallbacks kick in (biggest single quick-tier cost)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The TPU-tunnel sitecustomize pins jax_platforms at interpreter boot; the
# env var alone does not undo it, so force the CPU backend via jax.config.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the jitted train/val/generate graphs dominate
# test wall-clock (the 8-device step compiles for minutes); cached
# executables make reruns fast. Keys include platform, so sharing the dir
# with TPU runs is safe.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "CTTA_JAX_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy tests (run with -m slow; quick tier skips them)",
    )


# Tiering: the quick tier is `pytest -m "not slow"`; the default run
# includes everything.

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def import_reference_diffusers():
    """Import the reference's vendored diffusers (torch) for golden parity
    tests, with small compatibility shims for the newer installed deps."""
    import sys

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import huggingface_hub

    if not hasattr(huggingface_hub, "cached_download"):
        huggingface_hub.cached_download = huggingface_hub.hf_hub_download

    import jax

    if not hasattr(jax.random, "KeyArray"):
        jax.random.KeyArray = jax.Array
    if not hasattr(jax.numpy, "DeviceArray"):
        jax.numpy.DeviceArray = jax.Array

    import diffusers  # noqa: F401  (the vendored one, via sys.path)

    return diffusers


def load_repo_tool(name: str):
    """Import a module from THIS repo's `tools/` directory by explicit file
    path. `tools/` has no __init__.py and the reference root (whose `tools/`
    IS a regular package) gets prepended to sys.path by the parity imports
    above, so a plain `import tools.x` resolves into /root/reference after
    any parity test has run — the full-suite-only failure mode this helper
    exists to prevent."""
    import importlib.util
    import sys

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", f"{name}.py",
    )
    mod_name = f"_repo_tools_{name}"
    if mod_name in sys.modules:
        return sys.modules[mod_name]
    spec = importlib.util.spec_from_file_location(mod_name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod


def import_reference_audioldm():
    """Import the reference's *trimmed* audioldm copy (easy_inference/) for
    VAE / HiFi-GAN parity tests: unlike the full copy it has no
    librosa/soundfile dependencies at import time.

    Registered as a synthetic package pinned to the easy_inference tree so
    sys.path ordering (the full reference root is prepended by
    import_reference_diffusers) cannot make `audioldm` resolve to the
    librosa-dependent full copy."""
    import sys
    import types

    pkg_path = os.path.join(REFERENCE_ROOT, "easy_inference", "audioldm")
    existing = sys.modules.get("audioldm")
    if existing is None or pkg_path not in list(getattr(existing, "__path__", [])):
        pkg = types.ModuleType("audioldm")
        pkg.__path__ = [pkg_path]
        sys.modules["audioldm"] = pkg

    import importlib

    vae_mod = importlib.import_module("audioldm.variational_autoencoder.autoencoder")
    hifigan = importlib.import_module("audioldm.hifigan")
    return vae_mod, hifigan
