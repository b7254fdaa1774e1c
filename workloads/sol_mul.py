"""Speed-of-light probe: in-VMEM Montgomery mul rate on the real TPU.

The standalone Pallas mul (ops/pallas_field.py) is HBM-bound: each call
reads 2x64B and writes 64B per lane for ~one VPU mul's work.  This kernel
chains K muls on VMEM-resident state (the regime the fused Poseidon
S-boxes run in), giving the COMPUTE-bound mul rate that bounds any fused
field kernel — the denominator for the BENCHMARKS.md ceiling table.

Usage: python workloads/sol_mul.py  (runs on the attached TPU)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from reef_tpu.ops import limb  # noqa: E402
from reef_tpu.ops.limb import N, FQ as lf  # noqa: E402
from reef_tpu.ops.pallas_field import mul_tile  # noqa: E402

BLOCK = 1024
SUB = BLOCK // 128
K = 256                          # chained muls per element per call


def _body(k_iters, x_ref, o_ref):
    x = [x_ref[i] for i in range(N)]

    def step(_, x):
        return mul_tile(lf, x, x)

    x = jax.lax.fori_loop(0, k_iters, step, x)
    for i in range(N):
        o_ref[i] = x[i]


@functools.lru_cache(maxsize=None)
def _call(n_blocks, k_iters):
    spec = pl.BlockSpec((N, SUB, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_body, k_iters),
        out_shape=jax.ShapeDtypeStruct((N, n_blocks * SUB, 128),
                                       jnp.uint32),
        grid=(n_blocks,),
        in_specs=[spec],
        out_specs=spec,
    )


def main(B=1 << 16):
    import random
    rng = random.Random(1)
    xs = [rng.randrange(lf.p_int) for _ in range(B)]
    x = np.asarray(lf.encode(xs), np.uint32)       # (B, N) Montgomery
    sv = jnp.asarray(x.T.reshape(N, B // 128, 128))
    fn = jax.jit(lambda v: _call(B // BLOCK, K)(v))
    out = fn(sv)
    out.block_until_ready()
    # correctness: x^(2^K) per element, spot-check a few rows
    got = np.asarray(out).reshape(N, B).T
    for row in (0, B // 2, B - 1):
        want = xs[row]
        for _ in range(K):
            want = want * want % lf.p_int
        assert lf.decode(got[row].reshape(1, N)) == [want], f"row {row}"
    best = None
    for _ in range(6):
        t0 = time.time()
        out = fn(sv)
        out.block_until_ready()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    rate = B * K / best
    print(f"in-VMEM mont mul: {rate/1e6:.0f}M mul/s "
          f"(B={B}, K={K}, {best*1e3:.1f}ms/call), bit-exact vs host pow")
    return rate


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    main()
