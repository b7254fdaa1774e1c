"""Guard: the committed compile-cache entries actually HIT.

The slow lane and the driver's dryrun depend on tests/.jax_cache serving
the big SPMD limb executables (a silent miss = a minutes-long recompile
that looks like a hang, and a driver rc=124).  This check compiles the
exact dryrun/commit-path kernel shape and asserts jax reported a
persistent-cache hit — it fails LOUDLY when a jax/XLA bump (or a kernel
edit) invalidates the committed entries, which is the moment to re-warm
them (run the slow lane once, then `git add tests/.jax_cache`).

Marked slow: even a cache HIT pays the ~90s AOT deserialization of the
16MB executable on this host.
"""

import jax
import pytest

pytestmark = pytest.mark.slow


def test_dryrun_msm_kernel_hits_persistent_cache():
    from jax._src import monitoring

    from reef_tpu.ec.msm import pallas_kernels
    from reef_tpu.parallel.mesh import (_mesh_msm_cap, _sharded_msm_jit,
                                        make_mesh)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cap = _mesh_msm_cap()          # the shape the dryrun/lanes actually use

    events = []

    def listener(event, **kw):
        events.append(event)

    monitoring.register_event_listener(listener)
    try:
        mesh = make_mesh(8)
        ck = pallas_kernels()
        fn = _sharded_msm_jit(mesh, ck, "data", cap)
        # force the compile (lower+compile without executing: no input
        # tensors needed, and a hit is still recorded)
        import jax.numpy as jnp
        import numpy as np
        from reef_tpu.ops import limb
        from reef_tpu.ec.msm_pippenger import N_WINDOWS
        from jax.sharding import NamedSharding, PartitionSpec as P

        pts = jax.device_put(
            jnp.zeros((8 * cap, 3, limb.N), jnp.uint32),
            NamedSharding(mesh, P("data", None, None)))
        args = (pts,
                jnp.zeros((8, N_WINDOWS, cap), jnp.int32),
                jnp.zeros((8, N_WINDOWS, 255), jnp.int32),
                jnp.zeros((8, N_WINDOWS, 255), bool),
                jnp.asarray(np.asarray(ck.ident)))
        fn.lower(*args).compile()
    finally:
        try:
            monitoring._unregister_event_listener_by_callback(listener)
        except Exception:
            pass

    hits = [e for e in events if "cache_hit" in e]
    misses = [e for e in events if "cache_miss" in e]
    assert hits and not misses, (
        "committed compile-cache entry MISSED for the dryrun sharded-MSM "
        f"kernel (events: {events}) — re-warm tests/.jax_cache: run "
        "`pytest tests/test_mesh.py -m 'slow or slowest'` once and commit "
        "the new entries")
