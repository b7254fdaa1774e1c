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


def _stack(*vals):
    """Stack G limb lists into one limb list of (G, ...)-shaped tiles."""
    return [jnp.stack([v[i] for v in vals]) for i in range(N)]


def _unstack(t, g):
    """Inverse of _stack: limb list of (G, ...) tiles -> G limb lists."""
    return [[t[i][j] for i in range(N)] for j in range(g)]


def padd_tiles(ck: CurveKernels, X1, Y1, Z1, X2, Y2, Z2):
    """Complete addition on limb-list tiles (pure jnp; shared by the Pallas
    kernel body and direct tests).  Returns (X3, Y3, Z3) limb lists.

    The 14 Montgomery muls of the RCB16 a=0 formula come in 4 mutually
    independent groups (3 + 3 + 2 + 6); each group is ONE mul_tile call on
    stacked (G, ...) tiles so the VPU sees G interleaved independent
    multiplications — the ILP structure that lifts the fused Poseidon
    kernel to ~96% of the independent-mul ruler (818M mul/s, probe_msm5
    phase 1), where a serial mul chain is latency-bound at ~148M."""
    f = ck.lf
    b3_int = 15 * f.r_int % f.p_int  # 3b in Montgomery form
    b3 = [u32(v) for v in F.to_limbs(b3_int)]
    b3t = [jnp.full_like(X1[0], v) for v in b3]

    mul = lambda a, b: mul_tile(f, a, b)
    add = lambda a, b: add_tile(f, a, b)
    sub = lambda a, b: sub_tile(f, a, b)

    # group 1: t0 = X1*X2, t1 = Y1*Y2, t2 = Z1*Z2
    t0, t1, t2 = _unstack(mul(_stack(X1, Y1, Z1), _stack(X2, Y2, Z2)), 3)
    # group 2: the three cross sums (Xi+Yi)(..), (Yi+Zi)(..), (Xi+Zi)(..)
    sA = add(_stack(X1, Y1, X1), _stack(Y1, Z1, Z1))
    sB = add(_stack(X2, Y2, X2), _stack(Y2, Z2, Z2))
    pair = add(_stack(t0, t1, t0), _stack(t1, t2, t2))
    t3, t4, t5 = _unstack(sub(mul(sA, sB), pair), 3)
    # group 3: 3b * {t2, t5}
    b3t2, Y3 = _unstack(mul(_stack(b3t, b3t), _stack(t2, t5)), 2)
    d0 = add(t0, t0)
    t0 = add(d0, t0)                 # 3*t0
    Z3 = add(t1, b3t2)
    t1 = sub(t1, b3t2)
    # group 4: the 6 independent product terms of the final combination
    q = mul(_stack(t4, t3, Y3, t1, t0, Z3), _stack(Y3, t1, t0, Z3, t3, t4))
    q0, q1, q2, q3, q4, q5 = _unstack(q, 6)
    X3 = sub(q1, q0)                 # t3*t1 - t4*Y3
    Y3f, Z3f = _unstack(add(_stack(q3, q5), _stack(q2, q4)), 2)
    return X3, Y3f, Z3f


def padd_affine_tiles(ck: CurveKernels, X1, Y1, X2, Y2):
    """Complete addition of two Z=1 points on limb-list tiles: the RCB16
    a=0 formula with Z1 = Z2 = 1 folded in — t2 = 1 and 3b*t2 = 3b are
    constants, and t4 = (Y1+1)(Y2+1)-t1-1 = Y1+Y2 and the X3 cross term
    collapse to additions, leaving 10 Montgomery muls (2+2+6 independent
    groups) instead of 14.  Used for the first level of the MSM pairwise
    tree, where both inputs are basis points (DeviceBasisV3 pads with
    zero-scalar generators precisely so every basis lane has Z = 1)."""
    f = ck.lf
    b3_int = 15 * f.r_int % f.p_int
    b3t = [jnp.full_like(X1[0], u32(v)) for v in F.to_limbs(b3_int)]

    mul = lambda a, b: mul_tile(f, a, b)
    add = lambda a, b: add_tile(f, a, b)
    sub = lambda a, b: sub_tile(f, a, b)

    t0, t1 = _unstack(mul(_stack(X1, Y1), _stack(X2, Y2)), 2)
    t4 = add(Y1, Y2)                         # (Y1+1)(Y2+1) - t1 - 1
    t5 = add(X1, X2)                         # (X1+1)(X2+1) - t0 - 1
    m3, Y3 = _unstack(mul(_stack(add(X1, Y1), b3t),
                          _stack(add(X2, Y2), t5)), 2)
    t3 = sub(m3, add(t0, t1))
    d0 = add(t0, t0)
    t0 = add(d0, t0)                         # 3*t0
    Z3 = add(t1, b3t)                        # t1 + 3b (t2 = 1)
    t1 = sub(t1, b3t)
    q = mul(_stack(t4, t3, Y3, t1, t0, Z3), _stack(Y3, t1, t0, Z3, t3, t4))
    q0, q1, q2, q3, q4, q5 = _unstack(q, 6)
    X3 = sub(q1, q0)
    Y3f, Z3f = _unstack(add(_stack(q3, q5), _stack(q2, q4)), 2)
    return X3, Y3f, Z3f


def _padd_body(ck: CurveKernels, chunk: int, p_ref, q_ref, o_ref):
    """Pallas kernel body: refs are (3, 16, chunk*8, 128) uint32 blocks.

    `chunk` sub-blocks of 1024 lanes per grid step: the per-grid-step
    pipeline overhead on the v5e measured ~15 us regardless of block size
    (probe_mul_stream phase 3: even a pure copy ran at ~7 GB/s with
    1024-lane blocks), so one-padd-per-step capped the kernel at ~22M
    padd-lanes/s.  Amortizing 8 sub-blocks per step lifted it to ~54M
    (probe run, 2.4x); VMEM budget caps chunk at 8 (3 buffers x 1.5 MB,
    double-buffered, inside the 16 MB scoped limit)."""
    def step(c, _):
        idx = (slice(None), slice(None), pl.ds(c * SUB, SUB), slice(None))
        P = p_ref[idx]
        Q = q_ref[idx]
        X3, Y3, Z3 = padd_tiles(
            ck, [P[0, i] for i in range(N)], [P[1, i] for i in range(N)],
            [P[2, i] for i in range(N)], [Q[0, i] for i in range(N)],
            [Q[1, i] for i in range(N)], [Q[2, i] for i in range(N)])
        o_ref[idx] = jnp.stack(
            [jnp.stack(X3), jnp.stack(Y3), jnp.stack(Z3)])
        return 0

    if chunk == 1:
        step(0, 0)
    else:
        jax.lax.fori_loop(0, chunk, step, 0)


MAX_CHUNK = 8


@functools.lru_cache(maxsize=None)
def _padd_call(ck: CurveKernels, n_blocks: int, interpret: bool):
    chunk = MAX_CHUNK
    while n_blocks % chunk:
        chunk //= 2
    spec = pl.BlockSpec((3, N, chunk * SUB, 128), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_padd_body, ck, chunk),
        out_shape=jax.ShapeDtypeStruct((3, N, n_blocks * SUB, 128),
                                       jnp.uint32),
        grid=(n_blocks // chunk,),
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
