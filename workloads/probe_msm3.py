#!/usr/bin/env python
"""Probe 3 (fixed): real timings via forced d2h sync (block_until_ready is
a NO-OP on the tunneled axon platform — bench.py docstring)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache_tpu"))


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    def sync(x):
        idx = (0,) * (x.ndim - 1)
        return np.asarray(x[idx])      # slice on device, download O(1)

    from reef_tpu.ec import msm as M
    from reef_tpu.ec import pallas_ec as PE
    from reef_tpu.ops import limb, pallas_field

    ck = M.vesta_kernels()
    f = limb.FQ
    rng = np.random.default_rng(0)

    def rate(fn, x, y, reps, label, per_call_items):
        o = fn(x, y)
        t0 = time.time()
        o = fn(x, y)
        sync(o)
        one = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            o = fn(o, y)
        sync(o)
        dt = (time.time() - t0) / reps
        log(f"{label}: {per_call_items/dt/1e6:.2f}M items/s "
            f"({dt*1e3:.2f} ms/call chained, {one*1e3:.1f} ms single)")

    for B in (16384, 262144):
        a = jnp.asarray(rng.integers(0, 2**29, size=(B, limb.N),
                                     dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**29, size=(B, limb.N),
                                     dtype=np.uint32))
        mm = jax.jit(lambda x, y: pallas_field.mont_mul(f, x, y))
        rate(mm, a, b, 60, f"mont_mul(pallas) B={B}", B)
        lm = jax.jit(lambda x, y: limb.mul(f, x, y))
        rate(lm, a, b, 60, f"limb.mul(XLA) B={B}", B)
        la = jax.jit(lambda x, y: limb.add(f, x, y))
        rate(la, a, b, 60, f"limb.add(XLA) B={B}", B)

    for B in (16384, 262144):
        pts = rng.integers(0, 2**29, size=(2, 3, limb.N, B), dtype=np.uint32)
        P = jnp.asarray(pts[0]); Q = jnp.asarray(pts[1])
        rate(lambda x, y: PE.padd_soa(ck, x, y), P, Q, 30,
             f"padd_soa B={B}", B)

        pallas_field.enable(threshold=2048)
        try:
            Pa = jnp.asarray(np.ascontiguousarray(
                np.transpose(pts[0], (2, 0, 1))))
            Qa = jnp.asarray(np.ascontiguousarray(
                np.transpose(pts[1], (2, 0, 1))))
            pj = jax.jit(lambda x, y: M.padd(ck, x, y))
            rate(pj, Pa, Qa, 30, f"composed padd(pallas muls) B={B}", B)
        finally:
            pallas_field.disable()
        pjx = jax.jit(lambda x, y: M.padd(ck, x, y))
        rate(pjx, Pa, Qa, 30, f"composed padd(XLA muls) B={B}", B)

    log("DONE")


if __name__ == "__main__":
    main()
