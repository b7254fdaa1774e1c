"""Poseidon with the MDS mix as an integer matmul (MXU formulation).

The vanilla batched permutation spends ~25 of ~40 Montgomery muls per round
in the MDS matrix-vector product.  That product is linear with a constant
matrix, so for a batch it collapses into ONE byte-convolution matmul:

    out8[b, (i, kb)] = sum_{j, b2} A8[(i, kb), (j, b2)] * s8[b, (j, b2)]

where s8 byte-decomposes each state limb (t*32 bytes per element) and A8
holds the byte-decomposed MONTGOMERY-form MDS entries placed at byte
antidiagonals (kb = b1 + b2).  Products are < 2^16 with contraction length
t*32 = 160, so int32 accumulation is exact — and uint8 x uint8 -> int32
matmuls ride the TPU MXU.  Byte columns then pair into 16-bit columns
(< 2^31, within limb.redc_cols' headroom) and take one shared Montgomery
reduction per output lane.

S-boxes (x^5) remain general VPU/Pallas muls.  `permute` here is a drop-in
for reef_tpu.ops.poseidon.permute (same constants, same results).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import limb
from .limb import LimbField, N
from .poseidon_constants import FULL_ROUNDS, PARTIAL_ROUNDS, poseidon_params

BPE = 2 * N          # bytes per element (32)
OUT_COLS = 2 * BPE   # output byte columns (64)


@functools.lru_cache(maxsize=None)
def _mxu_consts(lf: LimbField, t: int):
    """(A8 uint8 (t*32, t*64) [contraction-major], rc (rounds, t, N),
    is_full (rounds,))."""
    rc, mds = poseidon_params(lf.p_int, t)
    n_rounds = FULL_ROUNDS + PARTIAL_ROUNDS[t]
    rc_arr = lf.encode_host(list(rc)).reshape(n_rounds, t, N)

    A = np.zeros((t * BPE, t * OUT_COLS), np.uint8)  # (in, out) layout
    for i in range(t):
        for j in range(t):
            m = (mds[i][j] * lf.r_int) % lf.p_int
            mbytes = [(m >> (8 * b)) & 0xFF for b in range(BPE)]
            for b1 in range(BPE):
                if mbytes[b1] == 0:
                    continue
                for b2 in range(BPE):
                    A[j * BPE + b2, i * OUT_COLS + b1 + b2] = mbytes[b1]
    half = FULL_ROUNDS // 2
    is_full = np.zeros(n_rounds, bool)
    is_full[:half] = True
    is_full[n_rounds - half:] = True
    # NB: numpy only — caching a jnp array created under a jit trace leaks
    # tracers into later traces
    return A, rc_arr, is_full


def _mds_matmul(lf: LimbField, s, t: int, A8):
    """s (..., t, N) -> (..., t, N) via the byte matmul + shared REDC."""
    lo = (s & 0xFF).astype(jnp.uint8)
    hi = ((s >> 8) & 0xFF).astype(jnp.uint8)
    s8 = jnp.stack([lo, hi], axis=-1).reshape(s.shape[:-2] + (t * BPE,))
    out8 = jax.lax.dot_general(
        s8, A8, (((s8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)          # (..., t*64)
    out8 = out8.astype(jnp.uint32).reshape(s.shape[:-2] + (t, OUT_COLS))
    cols16 = out8[..., 0::2] + (out8[..., 1::2] << 8)   # (..., t, 32)
    return limb.redc_cols(lf, cols16)


def permute(lf: LimbField, state, t: int | None = None):
    """MXU-MDS Poseidon permutation; bit-identical to poseidon.permute.

    Runs as three scans (full/partial/full) so partial rounds S-box ONLY
    lane 0 — the single-phase mask variant wastes 3*(t-1) muls per partial
    round (~70% of all S-box work for t=5)."""
    if t is None:
        t = state.shape[-2]
    A8, rc, is_full = _mxu_consts(lf, t)
    A8 = jnp.asarray(A8)
    rc = jnp.asarray(rc)
    half = FULL_ROUNDS // 2
    r_p = PARTIAL_ROUNDS[t]

    def full_round(s, rc_r):
        s = limb.add(lf, s, rc_r)
        s = limb.pow5(lf, s)
        return _mds_matmul(lf, s, t, A8), None

    def partial_round(s, rc_r):
        s = limb.add(lf, s, rc_r)
        lane0 = limb.pow5(lf, s[..., 0, :])
        s = s.at[..., 0, :].set(lane0)
        return _mds_matmul(lf, s, t, A8), None

    state, _ = jax.lax.scan(full_round, state, rc[:half])
    state, _ = jax.lax.scan(partial_round, state, rc[half:half + r_p])
    state, _ = jax.lax.scan(full_round, state, rc[half + r_p:])
    return state


permute_jit = jax.jit(permute, static_argnums=(0, 2))
