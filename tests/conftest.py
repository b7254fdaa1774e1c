"""Test config: run the suite on a virtual 8-device CPU mesh.

The session environment presets an `axon` (tunneled real-TPU) JAX platform via
sitecustomize, which registers at interpreter startup and wins platform
selection; plain `JAX_PLATFORMS=cpu` in the environment is not enough.  The
reliable override is `jax.config.update("jax_platforms", "cpu")` before any
computation.  Multi-chip sharding paths are validated here on 8 virtual CPU
devices (the driver separately dry-runs `__graft_entry__.dryrun_multichip`);
real-TPU benchmarking goes through bench.py, not the test suite.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# small sharded-MSM chunk: ONE fixed SPMD kernel shape for every commit
# size (the unchunked kernel compiled per basis size — minutes per shape
# on this 4-core CPU mesh).  64 matches the dryrun + scaling-curves
# shape, so a single cached executable serves every lane: the 256-chunk
# variant cost a 30-50 min cold compile per process (and fresh SPMD
# compiles need vm.max_map_count >~ 200k; AOT cache loads do not),
# which kept the `slow or slowest` lane unrunnable in a review budget
# (VERDICT r4 task 9).
os.environ.setdefault("REEF_MESH_MSM_CHUNK", "64")

# let the device-MSM executables use the persistent compile cache on this
# CPU platform: write+read round-trips were probed clean (jax 0.9), and the
# committed warm entries turn the minutes-long SPMD recompiles into cache
# loads.  (The production tunneled-TPU path keeps the bypass — ec/msm.py
# no_persistent_cache.)
os.environ.setdefault("REEF_MSM_CACHE", "1")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the slow lane's SPMD graphs compile for
# minutes on CPU; cache them across runs (first run warms, reruns are fast).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
