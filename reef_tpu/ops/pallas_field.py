"""Pallas TPU kernels for the hot field ops (Montgomery mul / pow5).

The pure-XLA limb path (reef_tpu.ops.limb) leaves the VPU underutilized:
limbs sit on the minor (lane) axis, filling 16 of 128 lanes, and every op
round-trips HBM.  These kernels flip the layout — limbs major, batch on
(sublane, lane) — so each limb row is a full 8x128 VREG, and run the whole
schoolbook product + 16 REDC rounds + carry propagation in VMEM.

Layout: a batch of B field elements (B multiple of 1024) is reshaped from
(B, 16) uint32 to (16, B/128, 128); the grid tiles the middle axis in blocks
of 8 sublanes (1024 elements per block).

`enable()` routes reef_tpu.ops.limb.mul through these kernels for large
batches on TPU; everything built on limb.mul (Poseidon, sumcheck folds, EC
adds, MSM) accelerates without code changes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as F
from . import limb
from .limb import BITS, MASK, N, LimbField

u32 = jnp.uint32
BLOCK = 1024          # elements per grid block (8 sublanes x 128 lanes)
SUB = BLOCK // 128    # 8


def mul_tile(f: LimbField, a, b):
    """Montgomery product on register tiles: a, b are lists of N same-shape
    uint32 arrays (one per limb); returns the product limb list.  Shared by
    the field kernel and the Pallas EC kernels."""
    mask = u32(F.LIMB_MASK)
    n0inv = u32(int(f.n0inv))
    p_limbs = [u32(int(v)) for v in f.p]

    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * N)
    for i in range(N):
        ai = a[i]
        for j in range(N):
            pp = ai * b[j]
            cols[i + j] = cols[i + j] + (pp & mask)
            cols[i + j + 1] = cols[i + j + 1] + (pp >> BITS)
    for i in range(N):
        m = (cols[i] * n0inv) & mask
        for j in range(N):
            mp = m * p_limbs[j]
            cols[i + j] = cols[i + j] + (mp & mask)
            cols[i + j + 1] = cols[i + j + 1] + (mp >> BITS)
        cols[i + 1] = cols[i + 1] + (cols[i] >> BITS)
    # carry-propagate the result half
    res = []
    carry = zero
    for k in range(N, 2 * N):
        t = cols[k] + carry
        res.append(t & mask)
        carry = t >> BITS
    return _cond_sub_tile(f, res)


def _cond_sub_tile(f: LimbField, res):
    mask = u32(F.LIMB_MASK)
    p_limbs = [u32(int(v)) for v in f.p]
    zero = jnp.zeros_like(res[0])
    borrow = zero
    sub = []
    for k in range(N):
        t = res[k] + u32(1 << BITS) - p_limbs[k] - borrow
        sub.append(t & mask)
        borrow = u32(1) - (t >> BITS)
    geq = borrow == 0
    return [jnp.where(geq, sub[k], res[k]) for k in range(N)]


def add_tile(f: LimbField, a, b):
    """Modular addition on register tiles (limb lists)."""
    mask = u32(F.LIMB_MASK)
    zero = jnp.zeros_like(a[0])
    carry = zero
    out = []
    for k in range(N):
        t = a[k] + b[k] + carry
        out.append(t & mask)
        carry = t >> BITS
    return _cond_sub_tile(f, out)


def sub_tile(f: LimbField, a, b):
    """Modular subtraction on register tiles."""
    mask = u32(F.LIMB_MASK)
    p_limbs = [u32(int(v)) for v in f.p]
    zero = jnp.zeros_like(a[0])
    borrow = zero
    diff = []
    for k in range(N):
        t = a[k] + u32(1 << BITS) - b[k] - borrow
        diff.append(t & mask)
        borrow = u32(1) - (t >> BITS)
    neg = borrow != 0
    carry = zero
    out = []
    for k in range(N):
        t = diff[k] + p_limbs[k] + carry
        out.append(t & mask)
        carry = t >> BITS
    return [jnp.where(neg, out[k], diff[k]) for k in range(N)]


def _mul_body(f: LimbField, a_ref, b_ref, o_ref):
    """Montgomery product on one block: refs are (16, 8, 128) uint32."""
    a = [a_ref[i] for i in range(N)]
    b = [b_ref[i] for i in range(N)]
    out = mul_tile(f, a, b)
    for k in range(N):
        o_ref[k] = out[k]


@functools.lru_cache(maxsize=None)
def _mul_call(f: LimbField, n_blocks: int, interpret: bool):
    spec = pl.BlockSpec((N, SUB, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mul_body, f),
        out_shape=jax.ShapeDtypeStruct((N, n_blocks * SUB, 128), jnp.uint32),
        grid=(n_blocks,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )


def mont_mul(f: LimbField, a, b, interpret: bool = False):
    """(B, 16) x (B, 16) -> (B, 16), B padded to a BLOCK multiple inside."""
    assert a.shape == b.shape and a.shape[-1] == N
    B = a.shape[0]
    Bp = -(-B // BLOCK) * BLOCK
    if Bp != B:
        pad = ((0, Bp - B), (0, 0))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    av = a.T.reshape(N, Bp // 128, 128)
    bv = b.T.reshape(N, Bp // 128, 128)
    out = _mul_call(f, Bp // BLOCK, interpret)(av, bv)
    return out.reshape(N, Bp).T[:B]


def _redc_body(f: LimbField, c_ref, o_ref):
    """Montgomery-reduce one block of 32-column accumulations: c_ref is
    (32, 8, 128) uint32 (columns < ~2^31), o_ref (16, 8, 128)."""
    mask = u32(F.LIMB_MASK)
    n0inv = u32(int(f.n0inv))
    p_limbs = [u32(int(v)) for v in f.p]
    cols = [c_ref[i] for i in range(2 * N)]
    for i in range(N):
        m = (cols[i] * n0inv) & mask
        for j in range(N):
            mp = m * p_limbs[j]
            cols[i + j] = cols[i + j] + (mp & mask)
            cols[i + j + 1] = cols[i + j + 1] + (mp >> BITS)
        cols[i + 1] = cols[i + 1] + (cols[i] >> BITS)
    res = []
    carry = jnp.zeros_like(cols[0])
    for k in range(N, 2 * N):
        t = cols[k] + carry
        res.append(t & mask)
        carry = t >> BITS
    # MXU accumulations can reach ~5p^2 > R*p: two conditional subtracts
    # (mirrors limb.redc_cols exactly)
    out = _cond_sub_tile(f, _cond_sub_tile(f, res))
    for k in range(N):
        o_ref[k] = out[k]


@functools.lru_cache(maxsize=None)
def _redc_call(f: LimbField, n_blocks: int, interpret: bool):
    in_spec = pl.BlockSpec((2 * N, SUB, 128), lambda i: (0, i, 0),
                           memory_space=pltpu.ANY if interpret
                           else pltpu.VMEM)
    out_spec = pl.BlockSpec((N, SUB, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.ANY if interpret
                            else pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_redc_body, f),
        out_shape=jax.ShapeDtypeStruct((N, n_blocks * SUB, 128), jnp.uint32),
        grid=(n_blocks,),
        in_specs=[in_spec],
        out_specs=out_spec,
        interpret=interpret,
    )


def mont_redc_cols(f: LimbField, cols, interpret: bool = False):
    """(B, 32) column accumulations -> (B, 16) canonical elements."""
    assert cols.shape[-1] == 2 * N
    B = cols.shape[0]
    Bp = -(-B // BLOCK) * BLOCK
    if Bp != B:
        cols = jnp.pad(cols, ((0, Bp - B), (0, 0)))
    cv = cols.T.reshape(2 * N, Bp // 128, 128)
    out = _redc_call(f, Bp // BLOCK, interpret)(cv)
    return out.reshape(N, Bp).T[:B]


# ---------------------------------------------------------------------------
# dispatch hook: route limb.mul through pallas for large TPU batches
# ---------------------------------------------------------------------------

_BASE_MUL = limb.mul
_BASE_REDC = limb.redc_cols
_THRESHOLD = 2048


def _dispatching_mul(f: LimbField, a, b):
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    n = int(np.prod(batch)) if batch else 1
    if n >= _THRESHOLD and n % 128 == 0:
        a = jnp.broadcast_to(a, batch + (N,)).reshape(n, N)
        b = jnp.broadcast_to(b, batch + (N,)).reshape(n, N)
        return mont_mul(f, a, b).reshape(batch + (N,))
    return _BASE_MUL(f, a, b)


def _dispatching_redc_cols(f: LimbField, cols):
    batch = cols.shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    if n >= _THRESHOLD and n % 128 == 0:
        return mont_redc_cols(f, cols.reshape(n, 2 * N)).reshape(
            batch + (N,))
    return _BASE_REDC(f, cols)


def enable(threshold: int = 2048, redc: bool = False):
    """Route limb.mul through the Pallas kernel for batches >= threshold.

    redc=True also routes limb.redc_cols through mont_redc_cols — measured
    bit-exact but ~9% SLOWER on the tunneled v5e at batch 16k (the per-call
    (B,32)->(32,B/128,128) transposes outweigh the lane-utilization win;
    XLA already fuses the REDC into the MXU matmul's epilogue).  Kept for
    layouts that are already limbs-major."""
    global _THRESHOLD
    _THRESHOLD = threshold
    limb.mul = _dispatching_mul
    if redc:
        limb.redc_cols = _dispatching_redc_cols


def disable():
    limb.mul = _BASE_MUL
    limb.redc_cols = _BASE_REDC
