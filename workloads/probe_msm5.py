#!/usr/bin/env python
"""Round-5 MSM attack probe: where do the 47% go, and what can padd reach?

Measures, on the real chip:
  1. independent-stream in-VMEM Montgomery mul ruler (M parallel streams
     per lane block — the ILP-overlapped ceiling VERDICT r4 weak #8 asks
     for, vs the latency-limited chained-squaring ruler);
  2. in-VMEM chained padd ruler (K complete adds on VMEM-resident state —
     the compute-bound ceiling for any fused MSM tree kernel);
  3. padd_soa HBM-roundtrip rate at MSM lane counts (the v3 tree's
     actual primitive);
  4. v3 kernel phase split at the fold shape: full kernel vs tree-only
     vs prep-only (sort+counts), cap 16384 vs 65536.

Usage: python workloads/probe_msm5.py [phase...]   (default: 1 2 3)
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


def log(*a):
    print(*a, flush=True)


def sync(x):
    idx = (0,) * (x.ndim - 1)
    return np.asarray(x[idx])


# ---------------------------------------------------------------- phase 1
def _indep_body(k_iters, m_streams, x_ref, o_ref):
    """M independent squaring chains per block: stream s lives on
    sublane-slice s.  Each fori_loop step advances ALL streams once —
    the M muls are mutually independent, exposing ILP the single-chain
    ruler cannot."""
    xs = [[x_ref[s, i] for i in range(N)] for s in range(m_streams)]

    def step(_, xs):
        return [mul_tile(lf, x, x) for x in xs]

    xs = jax.lax.fori_loop(0, k_iters, step, xs)
    for s in range(m_streams):
        for i in range(N):
            o_ref[s, i] = xs[s][i]


@functools.lru_cache(maxsize=None)
def _indep_call(k_iters, m_streams, n_blocks):
    spec = pl.BlockSpec((m_streams, N, SUB, 128), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_indep_body, k_iters, m_streams),
        out_shape=jax.ShapeDtypeStruct((m_streams, N, n_blocks * SUB, 128),
                                       jnp.uint32),
        grid=(n_blocks,),
        in_specs=[spec],
        out_specs=spec,
    )


def phase1(B=1 << 14, K=64):
    rng = np.random.default_rng(1)
    for M in (1, 2, 4):
        x = rng.integers(0, 2 ** 29, size=(M, N, B // 128, 128),
                         dtype=np.uint32)
        xd = jnp.asarray(x)
        fn = jax.jit(lambda v: _indep_call(K, M, B // BLOCK)(v))
        o = fn(xd)
        sync(o)
        t0 = time.time()
        reps = 6
        for _ in range(reps):
            o = fn(o)
        sync(o)
        dt = (time.time() - t0) / reps
        rate = M * B * K / dt
        log(f"phase1 indep-mul M={M} B={B} K={K}: {rate/1e6:.0f}M mul/s "
            f"({dt*1e3:.1f} ms/call)")


# ---------------------------------------------------------------- phase 2
def _padd_chain_body(ck, k_iters, p_ref, q_ref, o_ref):
    from reef_tpu.ec.pallas_ec import padd_tiles
    P = [[p_ref[c, i] for i in range(N)] for c in range(3)]
    Q = [[q_ref[c, i] for i in range(N)] for c in range(3)]

    def step(_, P):
        X, Y, Z = padd_tiles(ck, P[0], P[1], P[2], Q[0], Q[1], Q[2])
        return [X, Y, Z]

    P = jax.lax.fori_loop(0, k_iters, step, P)
    for c in range(3):
        for i in range(N):
            o_ref[c, i] = P[c][i]


@functools.lru_cache(maxsize=None)
def _padd_chain_call(ck, k_iters, n_blocks):
    spec = pl.BlockSpec((3, N, SUB, 128), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_padd_chain_body, ck, k_iters),
        out_shape=jax.ShapeDtypeStruct((3, N, n_blocks * SUB, 128),
                                       jnp.uint32),
        grid=(n_blocks,),
        in_specs=[spec, spec],
        out_specs=spec,
    )


def phase2(B=1 << 13, K=32):
    from reef_tpu.ec import msm as M
    ck = M.vesta_kernels()
    cv = ck.curve
    import random
    RNG = random.Random(3)
    pts = [cv.mul(RNG.randrange(1, cv.order), cv.gen) for _ in range(4)]
    proj = np.asarray(ck.to_proj(pts))                    # (4, 3, N)
    P = np.tile(proj.transpose(1, 2, 0), (1, 1, B // 4)) \
        .reshape(3, N, B // 128, 128)
    Q = np.roll(P, 1, axis=-1)
    fn = jax.jit(lambda p, q: _padd_chain_call(ck, K, B // BLOCK)(p, q))
    o = fn(jnp.asarray(P), jnp.asarray(Q))
    sync(o)
    t0 = time.time()
    reps = 6
    for _ in range(reps):
        o = fn(o, jnp.asarray(Q))
    sync(o)
    dt = (time.time() - t0) / reps
    log(f"phase2 in-VMEM chained padd B={B} K={K}: "
        f"{B*K/dt/1e6:.1f}M padd/s ({dt*1e3:.1f} ms/call) "
        f"[mul-eq {B*K*14/dt/1e6:.0f}M/s]")


# ---------------------------------------------------------------- phase 3
def phase3(B=1 << 18):
    from reef_tpu.ec import msm as M
    from reef_tpu.ec.pallas_ec import padd_soa
    ck = M.vesta_kernels()
    rng = np.random.default_rng(2)
    P = jnp.asarray(rng.integers(0, 2 ** 16, size=(3, N, B),
                                 dtype=np.uint32))
    Q = jnp.asarray(rng.integers(0, 2 ** 16, size=(3, N, B),
                                 dtype=np.uint32))
    fn = jax.jit(lambda p, q: padd_soa(ck, p, q))
    o = fn(P, Q)
    sync(o)
    t0 = time.time()
    reps = 8
    for _ in range(reps):
        o = fn(o, Q)
    sync(o)
    dt = (time.time() - t0) / reps
    log(f"phase3 padd_soa HBM B={B}: {B/dt/1e6:.1f}M padd/s "
        f"({dt*1e3:.1f} ms/call)")


# ---------------------------------------------------------------- phase 4
def phase4(n=1 << 16, caps=(16384, 65536)):
    import random
    from reef_tpu.ec import msm as M
    from reef_tpu.ec import msm_v3 as V3
    from reef_tpu.ec.pasta import VESTA
    from reef_tpu.ec.msm import no_persistent_cache

    RNG = random.Random(5)
    ck = M.vesta_kernels()
    pts = [VESTA.mul(RNG.randrange(1, 1 << 64), VESTA.gen)
           for _ in range(256)]
    pts = (pts * (n // len(pts) + 1))[:n]
    scalars = [RNG.randrange(VESTA.order) for _ in range(n)]
    for cap in caps:
        basis = V3.DeviceBasisV3(ck, pts, cap=cap)
        scb = np.zeros((basis.n2, 32), np.uint8)
        scb[:n] = V3.scalars_to_bytes(scalars, ck.curve.order)
        scb_d = jnp.asarray(scb.reshape(basis.n_chunks, basis.cap, 32))
        kern = V3._kernel_jit(ck, basis.cap, basis.n_chunks,
                              V3._use_fused())
        with no_persistent_cache():
            t0 = time.time()
            out = kern(basis.arr, scb_d, basis.ident_soa)
            sync(out)
            log(f"phase4 cap={cap}: first call {time.time()-t0:.1f}s "
                "(compile)")
            t0 = time.time()
            reps = 5
            for _ in range(reps):
                out = kern(basis.arr, scb_d, basis.ident_soa)
            sync(out)
            dt = (time.time() - t0) / reps
            log(f"phase4 v3 kernel n={n} cap={cap}: {n/dt/1e3:.0f}k pts/s "
                f"({dt*1e3:.0f} ms/call)")


if __name__ == "__main__":
    log(f"platform: {jax.devices()[0].platform}")
    phases = sys.argv[1:] or ["1", "2", "3"]
    for ph in phases:
        {"1": phase1, "2": phase2, "3": phase3, "4": phase4}[ph]()
    log("probe done")
