#!/usr/bin/env python
"""Probe: streaming Montgomery-mul ceiling with single-use operands.

The ILP ruler (probe_msm5 phase 1) reuses register-resident operands
(x = x*x chains); real kernels (padd tree) consume each operand once from
VMEM.  This probe measures:
  1. mont_mul HBM-roundtrip rate (1 mul per element, single-use);
  2. a fused "mulK" kernel: K chained muls per element in one body
     (c = a*b; c = c*b; ...) — operand b stays resident, K muls per
     HBM roundtrip, working set tiny: the single-use compute ceiling;
  3. same as 2 but G-way stacked tiles (G independent chains): does
     stacking raise issue rate when operands are VMEM-fresh?
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

from reef_tpu.ops.limb import N, FQ as lf  # noqa: E402
from reef_tpu.ops.pallas_field import mul_tile, mont_mul  # noqa: E402

BLOCK = 1024
SUB = BLOCK // 128


def log(*a):
    print(*a, flush=True)


def sync(x):
    idx = (0,) * (x.ndim - 1)
    return np.asarray(x[idx])


def phase1(B=1 << 18):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(B, N), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(B, N), dtype=np.uint32))
    fn = jax.jit(lambda x, y: mont_mul(lf, x, y))
    o = fn(a, b)
    sync(o)
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        o = fn(o, b)
    sync(o)
    dt = (time.time() - t0) / reps
    log(f"phase1 mont_mul HBM B={B}: {B/dt/1e6:.0f}M mul/s "
        f"({dt*1e3:.2f} ms/call)")


def _mulk_body(k, g, a_ref, b_ref, o_ref):
    if g == 1:
        a = [a_ref[i] for i in range(N)]
        b = [b_ref[i] for i in range(N)]
    else:
        a = [a_ref[:, i] for i in range(N)]
        b = [b_ref[:, i] for i in range(N)]
    c = mul_tile(lf, a, b)
    for _ in range(k - 1):
        c = mul_tile(lf, c, b)
    for i in range(N):
        if g == 1:
            o_ref[i] = c[i]
        else:
            o_ref[:, i] = c[i]


@functools.lru_cache(maxsize=None)
def _mulk_call(k, g, n_blocks):
    if g == 1:
        spec = pl.BlockSpec((N, SUB, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        oshape = (N, n_blocks * SUB, 128)
    else:
        spec = pl.BlockSpec((g, N, SUB, 128), lambda i: (0, 0, i, 0),
                            memory_space=pltpu.VMEM)
        oshape = (g, N, n_blocks * SUB, 128)
    return pl.pallas_call(
        functools.partial(_mulk_body, k, g),
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.uint32),
        grid=(n_blocks,),
        in_specs=[spec, spec],
        out_specs=spec,
    )


def phase2(B=1 << 17, K=8):
    rng = np.random.default_rng(2)
    for g in (1, 2, 4):
        shape = ((N, B // 128, 128) if g == 1
                 else (g, N, B // g // 128, 128))
        a = jnp.asarray(rng.integers(0, 1 << 16, size=shape,
                                     dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, size=shape,
                                     dtype=np.uint32))
        nb = (B // g) // BLOCK
        fn = jax.jit(lambda x, y: _mulk_call(K, g, nb)(x, y))
        o = fn(a, b)
        sync(o)
        t0 = time.time()
        reps = 8
        for _ in range(reps):
            o = fn(o, b)
        sync(o)
        dt = (time.time() - t0) / reps
        log(f"phase2 mulK G={g} B={B} K={K}: {B*K/dt/1e6:.0f}M mul/s "
            f"({dt*1e3:.2f} ms/call)")




def _copy_body(a_ref, o_ref):
    for i in range(N):
        o_ref[i] = a_ref[i]


def _copy_body_c(a_ref, o_ref):
    o_ref[...] = a_ref[...]


def phase3(B=1 << 18):
    """Raw per-block DMA cost: copy kernel, strided vs contiguous blocks."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(N, B // 128, 128),
                                 dtype=np.uint32))
    spec = pl.BlockSpec((N, SUB, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    fn = jax.jit(pl.pallas_call(
        _copy_body,
        out_shape=jax.ShapeDtypeStruct((N, B // 128, 128), jnp.uint32),
        grid=(B // BLOCK,), in_specs=[spec], out_specs=spec))
    o = fn(a)
    sync(o)
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        o = fn(o)
    sync(o)
    dt = (time.time() - t0) / reps
    log(f"phase3 copy strided B={B}: {dt*1e3:.2f} ms/call "
        f"({B*64*2/dt/1e9:.1f} GB/s)")

    ac = jnp.asarray(rng.integers(0, 1 << 16, size=(B // BLOCK, N, SUB, 128),
                                 dtype=np.uint32))
    specc = pl.BlockSpec((1, N, SUB, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    fnc = jax.jit(pl.pallas_call(
        _copy_body_c,
        out_shape=jax.ShapeDtypeStruct((B // BLOCK, N, SUB, 128),
                                       jnp.uint32),
        grid=(B // BLOCK,), in_specs=[specc], out_specs=specc))
    o = fnc(ac)
    sync(o)
    t0 = time.time()
    for _ in range(reps):
        o = fnc(o)
    sync(o)
    dt = (time.time() - t0) / reps
    log(f"phase3 copy contig  B={B}: {dt*1e3:.2f} ms/call "
        f"({B*64*2/dt/1e9:.1f} GB/s)")


def _mul1_body_c(a_ref, b_ref, o_ref):
    a = [a_ref[0, i] for i in range(N)]
    b = [b_ref[0, i] for i in range(N)]
    c = mul_tile(lf, a, b)
    for i in range(N):
        o_ref[0, i] = c[i]


def phase4(B=1 << 18):
    """Single-mul body with contiguous blocks: the real streaming rate."""
    rng = np.random.default_rng(4)
    shape = (B // BLOCK, N, SUB, 128)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))
    spec = pl.BlockSpec((1, N, SUB, 128), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    fn = jax.jit(pl.pallas_call(
        _mul1_body_c,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
        grid=(B // BLOCK,), in_specs=[spec, spec], out_specs=spec))
    o = fn(a, b)
    sync(o)
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        o = fn(o, b)
    sync(o)
    dt = (time.time() - t0) / reps
    log(f"phase4 mul1 contig B={B}: {B/dt/1e6:.0f}M mul/s "
        f"({dt*1e3:.2f} ms/call)")


def phase5(B=1 << 18):
    """Bigger strided blocks: does block size amortize the per-step cost
    without a layout change?"""
    rng = np.random.default_rng(5)
    for sub in (8, 32, 64):
        blk = sub * 128
        spec = pl.BlockSpec((N, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        fn = jax.jit(pl.pallas_call(
            functools.partial(_mulk_body, 1, 1),
            out_shape=jax.ShapeDtypeStruct((N, B // 128, 128), jnp.uint32),
            grid=(B // blk,), in_specs=[spec, spec], out_specs=spec))
        a = jnp.asarray(rng.integers(0, 1 << 16, size=(N, B // 128, 128),
                                     dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, size=(N, B // 128, 128),
                                     dtype=np.uint32))
        o = fn(a, b)
        sync(o)
        t0 = time.time()
        reps = 10
        for _ in range(reps):
            o = fn(o, b)
        sync(o)
        dt = (time.time() - t0) / reps
        log(f"phase5 mul1 strided sub={sub} B={B}: {B/dt/1e6:.0f}M mul/s "
            f"({dt*1e3:.2f} ms/call)")


if __name__ == "__main__":
    log(f"platform: {jax.devices()[0].platform}")
    import sys as _s
    phases = _s.argv[1:] or ["1", "2"]
    for ph in phases:
        {"1": phase1, "2": phase2, "3": phase3, "4": phase4,
         "5": phase5}[ph]()
    log("probe done")
