#!/usr/bin/env python
"""Probe 2: v2 device Pippenger breakdown + bigger per-kernel sizes."""

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

    import random
    from reef_tpu.ec import msm as M
    from reef_tpu.ec import msm_pippenger as MP
    from reef_tpu.ec.pasta import VESTA

    sizes = [int(x) for x in sys.argv[1:]] or [13, 14]
    ck = M.vesta_kernels()
    rng = random.Random(3)
    nmax = 1 << max(sizes)
    log("deriving host points...")
    base = [VESTA.mul(rng.randrange(1, 1 << 64), VESTA.gen)
            for _ in range(512)]
    pts_all = (base * (nmax // 512 + 1))[:nmax]

    for lg in sizes:
        n = 1 << lg
        t0 = time.time()
        basis = MP.DeviceBasis(ck, pts_all[:n])
        log(f"basis upload n={n}: {time.time()-t0:.1f}s")
        scalars = [rng.randrange(VESTA.order) for _ in range(n)]
        os.environ["REEF_DEVICE_MSM_CHUNK"] = str(n)  # single kernel
        sc_pad = scalars + [0] * (basis.n2 - n)
        # prep timing
        t0 = time.time()
        order, lv_idx, lv_mask = MP.window_prep_v2(sc_pad, ck.curve.order,
                                                   basis.n2)
        prep = time.time() - t0
        t0 = time.time()
        try:
            from reef_tpu.ops import pallas_field
            pallas_field.enable(threshold=2048)
            kern = MP._window_kernel_v2(ck, basis.n2)
            accs = kern(basis.arr, jnp.asarray(order), jnp.asarray(lv_idx),
                        jnp.asarray(lv_mask),
                        jnp.asarray(np.asarray(ck.ident)))
            accs.block_until_ready()
            first = time.time() - t0
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                accs = kern(basis.arr, jnp.asarray(order),
                            jnp.asarray(lv_idx), jnp.asarray(lv_mask),
                            jnp.asarray(np.asarray(ck.ident)))
            accs.block_until_ready()
            steady = (time.time() - t0) / reps
            t0 = time.time()
            res = MP.combine_windows(ck, np.asarray(accs))
            comb = time.time() - t0
            log(f"n=2^{lg}: prep {prep:.2f}s  first {first:.1f}s  "
                f"steady {steady:.3f}s ({n/steady/1e3:.0f}k pts/s kernel)  "
                f"combine {comb:.2f}s  total-steady "
                f"{n/(prep+steady+comb)/1e3:.0f}k pts/s")
        finally:
            pallas_field.disable()

    log("DONE")


if __name__ == "__main__":
    main()
