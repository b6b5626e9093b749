import os
import sys

# Force CPU with 8 virtual devices for sharding tests; enable x64 for exact
# parity with the reference's float64 numerics.  (The environment presets
# JAX_PLATFORMS=axon — the real-TPU tunnel — which must NOT be used for
# tests: per-op round trips are ~100ms and there is only one chip.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the remote-TPU ("axon") PJRT
# plugin and pins jax_platforms; tests must run on local CPU — override at
# the config level, not just the environment.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: XLA compiles of the stencil programs dominate
# test wall-clock on cold runs; cache them across processes.
jax.config.update("jax_compilation_cache_dir", "/tmp/pydem_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
