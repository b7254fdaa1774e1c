"""Fully-fused Pallas Poseidon: all 64 rounds in one kernel, VMEM-resident.

The XLA formulation (ops/poseidon_mxu.py) dispatches ~64 round bodies whose
element-major (B, t, 16) limb ops fill only 16 of 128 VPU lanes and whose
state round-trips HBM between rounds.  This kernel keeps the whole
permutation on-chip:

  - state lives in VMEM across all rounds in LIMBS-MAJOR layout
    (t*16 planes of (8, 128) VREG tiles, 1024 elements per grid block) so
    every limb op is a full VREG — the layout the Montgomery kernels in
    ops/pallas_field.py established; the round loop carries it as a tuple
    of planes (no scatters — Mosaic has no scatter lowering);
  - S-boxes (x^5) run as three mont muls on those tiles — full-state in
    the 8 full rounds, lane 0 only in the partial rounds;
  - the MDS mix stays on the MXU: per round the state transposes to
    element-major bytes, multiplies the byte-convolution matrix A8 (the
    poseidon_mxu formulation, rows zero-padded 160->256 for clean tiling),
    and the 16-bit columns transpose back for a limbs-major Montgomery
    REDC;
  - each of the three phases (full/partial/full) is ONE lax.fori_loop with
    round constants dynamically indexed from a VMEM table, so the Mosaic
    program stays small enough for the (remote) compiler.

Bit-identical to ops.poseidon.permute / poseidon_mxu.permute (same
constants, same Montgomery domain): contract r1cs.rs:2260-2310 +
framework.rs:70-74 — the prover/circuit/verifier sponges all replay these
digests.
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
from .limb import N, LimbField
from .pallas_field import mul_tile, _cond_sub_tile
from .poseidon_constants import FULL_ROUNDS, PARTIAL_ROUNDS
from .poseidon_mxu import BPE, OUT_COLS, _mxu_consts

u32 = jnp.uint32
BLOCK = 1024
SUB = BLOCK // 128            # 8 sublanes per block
PAD_IN = 256                  # A8 rows padded 160 -> 256 (tiling)


@functools.lru_cache(maxsize=None)
def _consts(lf: LimbField, t: int):
    """(A8 padded+permuted (256, t*64) uint8, rc (rounds, t*16) uint32).

    A8's output columns are reordered [all lo bytes | all hi bytes] so the
    kernel pairs 16-bit columns with two CONTIGUOUS slices — a strided
    out[:, 0::2] slice would lower to an unsupported Mosaic gather."""
    A8, rc_arr, _ = _mxu_consts(lf, t)
    A8p = np.zeros((PAD_IN, t * OUT_COLS), np.uint8)
    A8p[: t * BPE] = A8
    perm = np.concatenate([np.arange(0, t * OUT_COLS, 2),
                           np.arange(1, t * OUT_COLS, 2)])
    A8p = np.ascontiguousarray(A8p[:, perm])
    # nibble split: Mosaic's MXU dot treats 8-bit operands as SIGNED, so
    # byte-valued inputs (>= 128) corrupt the products; nibbles (<= 15)
    # are exact in i8 and the four partial dots recombine with shifts
    A_lo = (A8p & 0xF).astype(np.int8)
    A_hi = (A8p >> 4).astype(np.int8)
    rc_flat = rc_arr.reshape(rc_arr.shape[0], t * N).astype(np.uint32)
    return A_lo, A_hi, rc_flat


def _sbox(lf: LimbField, s, t: int, lanes: int):
    """pow5 on the first `lanes` lanes; s = tuple of t*N (SUB,128) planes."""
    al = [jnp.stack([s[l * N + k] for l in range(lanes)])
          for k in range(N)]                      # limb-major, (lanes,SUB,128)
    x2 = mul_tile(lf, al, al)
    x4 = mul_tile(lf, x2, x2)
    x5 = mul_tile(lf, x4, al)
    out = list(s)
    for l in range(lanes):
        for k in range(N):
            out[l * N + k] = x5[k][l]
    return tuple(out)


def _add_rc(lf: LimbField, s, rc_ref, r, t: int):
    """s + round constants (scalar loads rc_ref[r, i] from SMEM), mod p."""
    mask = u32(F.LIMB_MASK)
    out = []
    for l in range(t):
        carry = jnp.zeros_like(s[0])
        res = []
        for k in range(N):
            v = s[l * N + k] + rc_ref[r, l * N + k] + carry
            res.append(v & mask)
            carry = v >> limb.BITS
        out.extend(_cond_sub_tile(lf, res))
    return tuple(out)


def _mds(lf: LimbField, s, t: int, A8):
    """MDS mix via MXU byte matmul; s tuple of t*N (SUB,128) planes."""
    mask = u32(F.LIMB_MASK)
    # limbs-major u32 -> element-major byte planes:
    # plane l*BPE + 2k + h = byte h of limb k of lane l
    planes = []
    for l in range(t):
        for k in range(N):
            v = s[l * N + k]
            planes.append(v & u32(0xFF))
            planes.append((v >> 8) & u32(0xFF))
    zero = jnp.zeros_like(planes[0])
    planes.extend([zero] * (PAD_IN - t * BPE))
    sp = jnp.stack(planes).reshape(PAD_IN, BLOCK)
    sT = sp.T                                     # (BLOCK, 256) u32 bytes
    s_lo = (sT & u32(0xF)).astype(jnp.int8)
    s_hi = (sT >> 4).astype(jnp.int8)

    A_lo, A_hi = A8

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    out = (dot(s_lo, A_lo)
           + ((dot(s_lo, A_hi) + dot(s_hi, A_lo)) << 4)
           + (dot(s_hi, A_hi) << 8))              # (BLOCK, t*64) exact
    out = out.astype(u32)
    h = t * BPE                                   # lo|hi split point
    cols16 = out[:, :h] + (out[:, h:] << 8)       # (BLOCK, t*32)
    colsT = cols16.T.reshape(t * BPE, SUB, 128)   # limbs-major cols

    new = []
    n0inv = u32(int(lf.n0inv))
    p_limbs = [u32(int(v)) for v in lf.p]
    for l in range(t):
        cols = [colsT[l * BPE + c] for c in range(BPE)]
        # Montgomery REDC of 32 columns -> 16 limbs
        for i in range(N):
            m = (cols[i] * n0inv) & mask
            for j in range(N):
                mp = m * p_limbs[j]
                cols[i + j] = cols[i + j] + (mp & mask)
                cols[i + j + 1] = cols[i + j + 1] + (mp >> limb.BITS)
            cols[i + 1] = cols[i + 1] + (cols[i] >> limb.BITS)
        res = []
        carry = jnp.zeros_like(cols[0])
        for k in range(N, 2 * N):
            v = cols[k] + carry
            res.append(v & mask)
            carry = v >> limb.BITS
        new.extend(_cond_sub_tile(lf, _cond_sub_tile(lf, res)))
    return tuple(new)


def _perm_body(lf: LimbField, t: int, r_p: int,
               rc_ref, Al_ref, Ah_ref, s_ref, o_ref):
    A8 = (Al_ref[...], Ah_ref[...])
    half = FULL_ROUNDS // 2

    def full_round(r, s):
        s = _add_rc(lf, s, rc_ref, r, t)
        s = _sbox(lf, s, t, t)
        return _mds(lf, s, t, A8)

    def partial_round(r, s):
        s = _add_rc(lf, s, rc_ref, r, t)
        s = _sbox(lf, s, t, 1)
        return _mds(lf, s, t, A8)

    s = tuple(s_ref[i] for i in range(t * N))
    s = jax.lax.fori_loop(0, half, full_round, s)
    s = jax.lax.fori_loop(half, half + r_p, partial_round, s)
    s = jax.lax.fori_loop(half + r_p, half + r_p + FULL_ROUNDS // 2,
                          full_round, s)
    for i in range(t * N):
        o_ref[i] = s[i]


@functools.lru_cache(maxsize=None)
def _perm_call(lf: LimbField, t: int, n_blocks: int, interpret: bool):
    r_p = PARTIAL_ROUNDS[t]
    n_rounds = FULL_ROUNDS + r_p
    A_lo, A_hi, rc = _consts(lf, t)
    ms = pltpu.ANY if interpret else pltpu.VMEM
    s_spec = pl.BlockSpec((t * N, SUB, 128), lambda i: (0, i, 0),
                          memory_space=ms)
    rc_spec = pl.BlockSpec((n_rounds, t * N), lambda i: (0, 0),
                           memory_space=pltpu.ANY if interpret
                           else pltpu.SMEM)
    a_spec = pl.BlockSpec(A_lo.shape, lambda i: (0, 0), memory_space=ms)
    inner = pl.pallas_call(
        functools.partial(_perm_body, lf, t, r_p),
        out_shape=jax.ShapeDtypeStruct((t * N, n_blocks * SUB, 128),
                                       jnp.uint32),
        grid=(n_blocks,),
        in_specs=[rc_spec, a_spec, a_spec, s_spec],
        out_specs=s_spec,
        interpret=interpret,
    )

    def call(sv):
        return inner(jnp.asarray(rc), jnp.asarray(A_lo),
                     jnp.asarray(A_hi), sv)

    return call


def permute(lf: LimbField, state, t: int | None = None,
            interpret: bool = False):
    """Drop-in for poseidon.permute: state (..., t, N) u32 Montgomery."""
    if t is None:
        t = state.shape[-2]
    batch = state.shape[:-2]
    B = int(np.prod(batch)) if batch else 1
    flat = state.reshape(B, t, N)
    Bp = -(-B // BLOCK) * BLOCK
    if Bp != B:
        flat = jnp.pad(flat, ((0, Bp - B), (0, 0), (0, 0)))
    # (B, t, N) -> limbs-major (t*N, B/128, 128)
    sv = flat.reshape(Bp, t * N).T.reshape(t * N, Bp // 128, 128)
    out = _perm_call(lf, t, Bp // BLOCK, interpret)(sv)
    res = out.reshape(t * N, Bp).T.reshape(Bp, t, N)[:B]
    return res.reshape(state.shape)


permute_jit = jax.jit(permute, static_argnums=(0, 2))
