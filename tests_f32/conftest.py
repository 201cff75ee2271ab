"""Float32 test lane: the TPU-default numeric mode.

Same virtual 8-device CPU mesh as ``tests/conftest.py`` but with x64 OFF,
so every suite here exercises the dtype the real TPU path runs in. Kept in
a separate directory because JAX's x64 flag is process-global: mixing
modes inside one pytest process would leak dtypes between tests.
Run via ``scripts/test_code.sh`` or ``python -m pytest tests_f32 -q``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def pytest_collection_modifyitems(config, items):
    """Refuse mixed-lane runs: the x64 flag is process-global, so
    collecting ``tests/`` and ``tests_f32/`` together silently corrupts
    whichever lane's conftest ran first."""
    import pytest

    dirs = {os.path.basename(os.path.dirname(str(item.fspath)))
            for item in items}
    if "tests" in dirs and "tests_f32" in dirs:
        raise pytest.UsageError(
            "tests/ (float64 lane) and tests_f32/ (float32 lane) must run "
            "in separate pytest processes; use scripts/test_code.sh.")
