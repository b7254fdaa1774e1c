"""Round-5 kernel measurement set for BENCHMARKS.md: fused Poseidon,
fused-tree MSM at fold shapes, and the row-batched MSM steady rate
(chained dispatches, one sync).  Bit-exactness is asserted inside
bench.bench_msm_device for the MSM rows."""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np, jax.numpy as jnp
import bench

print("poseidon:", round(bench.bench_poseidon(), 0), flush=True)
for n, cap in ((1 << 15, 16384), (1 << 16, 16384), (1 << 17, 16384)):
    try:
        v = bench.bench_msm_device(n=n, cap=cap)
        print(f"msm v3 n=2^{n.bit_length()-1}: {v:,.0f} pts/s", flush=True)
    except Exception as e:
        print(f"msm n={n}: ERR {e}", flush=True)
# rows kernel steady rate (chained, one sync)
from reef_tpu.ec import msm as M
from reef_tpu.ec import msm_v3 as V3
from reef_tpu.ec.pasta import PALLAS
RNG = random.Random(5)
ck = M.pallas_kernels()
n, R = 8192, 16
pts = [PALLAS.mul(RNG.randrange(1, 1 << 64), PALLAS.gen) for _ in range(256)]
pts = (pts * (n // len(pts) + 1))[:n]
basis = V3.DeviceBasisV3(ck, pts, cap=8192)
rows = [[RNG.randrange(PALLAS.order) for _ in range(n)] for _ in range(R)]
scb = np.zeros((R, basis.n2, 32), np.uint8)
for r, row in enumerate(rows):
    scb[r, :n] = V3.scalars_to_bytes(row, PALLAS.order)
kern = V3._rows_kernel_jit(ck, basis.cap, basis.n_chunks, True, True, R)
scb_d = jnp.asarray(scb.reshape(R, basis.n_chunks, basis.cap, 32))
out = kern(basis.arr, scb_d, basis.ident_soa)
np.asarray(out[0, 0, 0])
t0 = time.time(); reps = 4
for _ in range(reps):
    out = kern(basis.arr, scb_d, basis.ident_soa)
np.asarray(out[0, 0, 0])
dt = (time.time() - t0) / reps
print(f"rows kernel R={R} n=2^13: {R*n/dt:,.0f} pts/s ({dt*1e3:.0f} ms)",
      flush=True)
print("done")
