#!/usr/bin/env python
"""Real-chip probes for the round-3 device-MSM work: tunnel bandwidth,
fused Pallas padd (pallas_ec.padd_soa) compile + steady-state rate, and the
composed XLA padd (ec.msm.padd with per-mul Pallas dispatch) rate."""

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

    t0 = time.time()
    dev = jax.devices()[0]
    log(f"platform={dev.platform} enum {time.time()-t0:.1f}s")

    # 1. host->device bandwidth
    for mb in (2, 8):
        arr = np.random.randint(0, 2**31, size=(mb * 256 * 1024,), dtype=np.int32)
        t0 = time.time()
        d = jax.device_put(arr)
        d.block_until_ready()
        dt = time.time() - t0
        log(f"upload {mb}MB: {dt:.2f}s = {mb/dt:.1f} MB/s")
    # device->host
    t0 = time.time()
    _ = np.asarray(d)
    dt = time.time() - t0
    log(f"download 8MB: {dt:.2f}s = {8/dt:.1f} MB/s")

    from reef_tpu.ec import msm as M
    from reef_tpu.ec import pallas_ec as PE
    from reef_tpu.ops import limb

    ck = M.vesta_kernels()
    B = 16384
    rng = np.random.default_rng(0)
    # random projective points: encode random ints as coords (throughput
    # probe only; padd doesn't care about curve membership)
    pts = rng.integers(0, 2**29, size=(2, 3, limb.N, B), dtype=np.uint32)
    P = jnp.asarray(pts[0])
    Q = jnp.asarray(pts[1])

    # 2. fused Pallas padd
    t0 = time.time()
    out = PE.padd_soa(ck, P, Q)
    out.block_until_ready()
    log(f"padd_soa B={B} compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        out = PE.padd_soa(ck, out, Q)
    out.block_until_ready()
    dt = time.time() - t0
    log(f"padd_soa steady: {reps*B/dt/1e6:.2f}M padd-lanes/s "
        f"({dt/reps*1000:.1f} ms/call)")

    # 3. composed padd (XLA limb ops, per-mul pallas dispatch)
    from reef_tpu.ops import pallas_field
    pallas_field.enable(threshold=2048)
    Pa = jnp.asarray(np.transpose(pts[0], (2, 0, 1)))  # (B,3,N)
    Qa = jnp.asarray(np.transpose(pts[1], (2, 0, 1)))
    padd_jit = jax.jit(lambda a, b: M.padd(ck, a, b))
    t0 = time.time()
    out2 = padd_jit(Pa, Qa)
    out2.block_until_ready()
    log(f"composed padd B={B} compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(reps):
        out2 = padd_jit(out2, Qa)
    out2.block_until_ready()
    dt = time.time() - t0
    log(f"composed padd steady: {reps*B/dt/1e6:.2f}M padd-lanes/s "
        f"({dt/reps*1000:.1f} ms/call)")
    pallas_field.disable()

    log("DONE")


if __name__ == "__main__":
    main()
