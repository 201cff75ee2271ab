"""Root pytest configuration: environment for the doctest lane.

``scripts/test_code.sh`` runs ``pytest --doctest-modules safe_learning_tpu``
from the repo root; module doctests need the same CPU-backend setup as the
test lanes (drop this machine's TPU-tunnel PJRT plugin, force the CPU
backend, enable x64 so printed values are exact). The per-lane conftests in
``tests/`` and ``tests_f32/`` run after this one and re-assert their own
x64 mode.
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
jax.config.update("jax_enable_x64", True)
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

collect_ignore = ["examples", "benchmarks", "scripts", "bench.py",
                  "__graft_entry__.py"]
