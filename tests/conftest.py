"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

This machine injects a TPU-tunnel PJRT plugin (``axon``) into every Python
process via ``sitecustomize``; it routes XLA compiles through a remote relay
(~10 s per compile) and leaves a thread that blocks interpreter shutdown for
minutes. Tests are pure-CPU, so the plugin's backend factory is dropped
before JAX initializes its backends.
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

# sitecustomize imports jax with JAX_PLATFORMS=axon before this file runs;
# override the already-latched config value as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: repeated test runs skip XLA compiles.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
