"""Pallas EC kernels: batched complete point addition + bounded-graph MSM.

The earlier pure-XLA MSM fused hundreds of limb ops per scan body, which the
tunneled TPU compiler cannot digest (BENCHMARKS.md infra note).  Here the
complete a=0 addition (RCB16 Alg.7) is ONE Mosaic kernel — XLA sees a single
custom call — and the MSM drives it from small jitted chunks:

  per scalar bit (MSB first):  acc = 2*acc + tree_reduce(masked points)

with every tree level and the doubling being padd kernel launches.  Each
jitted chunk's XLA graph contains only custom calls + selects, so compiles
stay fast and bounded regardless of n.

Point batches are (3, 16, B) uint32 — coordinate-major, limbs-major,
batch on lanes (the kernels view blocks as (3, 16, 8, 128))."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import field as F
from ..ops import limb
from ..ops.limb import LimbField, N
from ..ops.pallas_field import BLOCK, SUB, add_tile, mul_tile, sub_tile
from .msm import CurveKernels

u32 = jnp.uint32


def padd_tiles(ck: CurveKernels, X1, Y1, Z1, X2, Y2, Z2):
    """Complete addition on limb-list tiles (pure jnp; shared by the Pallas
    kernel body and direct tests).  Returns (X3, Y3, Z3) limb lists."""
    f = ck.lf
    b3_int = 15 * f.r_int % f.p_int  # 3b in Montgomery form
    b3 = [u32(v) for v in F.to_limbs(b3_int)]
    b3t = [jnp.full_like(X1[0], v) for v in b3]

    mul = lambda a, b: mul_tile(f, a, b)
    add = lambda a, b: add_tile(f, a, b)
    sub = lambda a, b: sub_tile(f, a, b)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(Y1, Z1), add(Y2, Z2))
    t4 = sub(t4, add(t1, t2))
    X3 = mul(add(X1, Z1), add(X2, Z2))
    Y3 = sub(X3, add(t0, t2))
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = mul(b3t, t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mul(b3t, Y3)
    X3 = mul(t4, Y3)
    X3 = sub(mul(t3, t1), X3)
    Y3 = mul(Y3, t0)
    Y3 = add(mul(t1, Z3), Y3)
    t0 = mul(t0, t3)
    Z3 = add(mul(Z3, t4), t0)
    return X3, Y3, Z3


def _padd_body(ck: CurveKernels, p_ref, q_ref, o_ref):
    """Pallas kernel body: refs are (3, 16, 8, 128) uint32 blocks."""
    X1 = [p_ref[0, i] for i in range(N)]
    Y1 = [p_ref[1, i] for i in range(N)]
    Z1 = [p_ref[2, i] for i in range(N)]
    X2 = [q_ref[0, i] for i in range(N)]
    Y2 = [q_ref[1, i] for i in range(N)]
    Z2 = [q_ref[2, i] for i in range(N)]
    X3, Y3, Z3 = padd_tiles(ck, X1, Y1, Z1, X2, Y2, Z2)
    for i in range(N):
        o_ref[0, i] = X3[i]
        o_ref[1, i] = Y3[i]
        o_ref[2, i] = Z3[i]


@functools.lru_cache(maxsize=None)
def _padd_call(ck: CurveKernels, n_blocks: int, interpret: bool):
    spec = pl.BlockSpec((3, N, SUB, 128), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_padd_body, ck),
        out_shape=jax.ShapeDtypeStruct((3, N, n_blocks * SUB, 128),
                                       jnp.uint32),
        grid=(n_blocks,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )


def padd_soa(ck: CurveKernels, P, Q, interpret: bool = False):
    """(3, 16, B) x (3, 16, B) -> (3, 16, B); B padded to BLOCK inside."""
    B = P.shape[-1]
    Bp = -(-B // BLOCK) * BLOCK
    if Bp != B:
        pad = ((0, 0), (0, 0), (0, Bp - B))
        P = jnp.pad(P, pad)
        Q = jnp.pad(Q, pad)
    Pv = P.reshape(3, N, Bp // 128, 128)
    Qv = Q.reshape(3, N, Bp // 128, 128)
    out = _padd_call(ck, Bp // BLOCK, interpret)(Pv, Qv)
    return out.reshape(3, N, Bp)[..., :B]


def aos_to_soa(pts):
    """(n, 3, N) -> (3, N, n)."""
    return jnp.transpose(pts, (1, 2, 0))


def soa_to_aos(pts):
    return jnp.transpose(pts, (2, 0, 1))


def _ident_soa(ck: CurveKernels, n: int):
    ident = np.zeros((3, N, n), np.uint32)
    one = ck.lf.encode_host(1)
    ident[1] = one[:, None]
    return ident


def _group_products(ck: CurveKernels, padd, bits, pts, python_loop=False):
    """Lane-parallel double-and-add for ONE group of BLOCK points.

    bits (nbits, BLOCK) uint32; pts (3, N, BLOCK).  Every lane runs its own
    scalar mult; the only EC primitive is a fixed-shape padd, so exactly one
    kernel shape exists regardless of n.  python_loop avoids lax.scan for
    the eager CPU validation path (scan always traces its body)."""
    ident = jnp.asarray(_ident_soa(ck, BLOCK))

    def body(acc, row):
        acc2 = padd(acc, acc)
        sel = jnp.where(row[None, None, :].astype(bool), pts, ident)
        return padd(acc2, sel), None

    if python_loop:
        acc = ident
        for row in list(bits):
            acc, _ = body(acc, row)
    else:
        acc, _ = jax.lax.scan(body, ident, bits)
    # tree-reduce the BLOCK lane products (padded back to BLOCK each level)
    n = BLOCK
    while n > 1:
        half = n // 2
        acc = padd(acc[..., :half], acc[..., half:half * 2])[..., :half]
        n = half
    return acc[..., :1]


@functools.lru_cache(maxsize=None)
def _group_jit(ck: CurveKernels, interpret: bool):
    padd = lambda a, b: padd_soa(ck, a, b, interpret)
    return jax.jit(functools.partial(_group_products, ck, padd))


def msm_pallas(ck: CurveKernels, scalars, points, interpret: bool = False,
               _padd_override=None):
    """MSM via the Pallas padd kernel; points (n,3,N) or host list -> (3,N).

    STATUS: orchestration CPU-validated; the compiled path is gated on
    Mosaic compile-time work (the padd kernel compiles in ~6 min on the
    tunneled TPU; per-site dedup needed before this is the default MSM)."""
    if isinstance(points, list):
        points = ck.to_proj(points)
    n = len(scalars)
    n2 = -(-n // BLOCK) * BLOCK
    pts = jnp.asarray(np.asarray(points))
    if n2 != n:
        pad = np.broadcast_to(ck.ident, (n2 - n, 3, N))
        pts = jnp.concatenate([pts, jnp.asarray(pad.copy())])
        scalars = list(scalars) + [0] * (n2 - n)
    pts = aos_to_soa(pts)
    # leading zero bits only double the identity: skip them when every
    # scalar is short (also keeps the CPU validation path tractable)
    nbits = max(1, max((int(s) % ck.curve.order).bit_length()
                       for s in scalars))
    bits = np.zeros((nbits, n2), np.uint32)
    for i, s in enumerate(scalars):
        s %= ck.curve.order
        for j in range(nbits):
            bits[j, i] = (s >> (nbits - 1 - j)) & 1

    if _padd_override is not None:
        fn = functools.partial(_group_products, ck, _padd_override,
                               python_loop=True)
    else:
        fn = _group_jit(ck, interpret)
    acc = None
    for g in range(n2 // BLOCK):
        sl = slice(g * BLOCK, (g + 1) * BLOCK)
        prod = fn(jnp.asarray(bits[:, sl]), pts[..., sl])
        if acc is None:
            acc = prod
        else:
            pa = _padd_override or (lambda a, b: padd_soa(ck, a, b, interpret))
            acc = pa(acc, prod)[..., :1]
    return soa_to_aos(acc)[0]
