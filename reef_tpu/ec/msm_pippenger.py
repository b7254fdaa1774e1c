"""TPU Pippenger MSM with bounded per-stage graphs.

The round-1 device MSM (ec.msm._msm_kernel) fused a 255-iteration scan whose
body inlined a full tree reduction — exactly the graph shape that wedges the
tunneled compile service for hours (BENCHMARKS.md infra note).  This module
restructures the MSM the way the sumcheck offload was fixed (commit 57357d8):
small, bounded kernels and a host-side combine.

Algorithm (per MSM of n points, c-bit windows, W = ceil(255/c) windows):
  host   1. digit-decompose scalars -> digits (W, n)  [numpy bit tricks]
         2. per window: stable-argsort points by digit DESCENDING -> order
            (W, n) index array, plus for each digit d>=1 the boundary index
            of the last point with digit >= d -> bnd (W, 2^c - 1) and a
            mask for empty prefixes
  device 3. gather points into window order (W, n, 3, N)
         4. Hillis-Steele inclusive prefix point-sum over the n axis
            (log2(n) levels, ONE batched complete-add per level)
         5. gather the 2^c - 1 boundary prefix sums per window, mask empty
            ones to the identity, tree-reduce them (c levels)
            -> one accumulated point per window:  A_w = sum_d d * B_{w,d}
            (Pippenger's running-sum identity: with points sorted by digit
            descending, sum_d d*B_d = sum_{d>=1} prefix[count(digit>=d)-1])
  host   6. combine: result = sum_w 2^{c*w} * A_w  (a 32-point host MSM)

Graph size: log2(n) + c batched point-adds total, each ~40 limb muls —
the same order as the proven-safe Poseidon scan body.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np

from ..ops import limb
from .msm import CurveKernels, padd
from .pasta import Point

WINDOW_C = 8
NBITS = 255
N_WINDOWS = (NBITS + WINDOW_C - 1) // WINDOW_C


def _digits_np(scalars: List[int], order_mod: int) -> np.ndarray:
    """(W, n) uint16 window digits via numpy byte tricks."""
    n = len(scalars)
    raw = np.zeros((n, 32), np.uint8)
    for i, s in enumerate(scalars):
        raw[i] = np.frombuffer((s % order_mod).to_bytes(32, "little"),
                               np.uint8)
    bits = np.unpackbits(raw, axis=1, bitorder="little")[:, :NBITS + 1]
    digs = np.zeros((N_WINDOWS, n), np.uint16)
    for w in range(N_WINDOWS):
        chunk = bits[:, w * WINDOW_C:(w + 1) * WINDOW_C]
        digs[w] = (chunk * (1 << np.arange(chunk.shape[1],
                                           dtype=np.uint16))).sum(axis=1)
    return digs


@functools.lru_cache(maxsize=None)
def _window_kernel(ck: CurveKernels, n: int, levels: int):
    import jax
    import jax.numpy as jnp

    def kernel(pts, order, bnd_idx, bnd_mask, ident):
        # pts (n,3,N); order (W,n); bnd_idx (W,D); bnd_mask (W,D)
        sorted_pts = pts[order]                       # (W, n, 3, N)

        def level(carry, shift):
            vals = carry
            shifted = jnp.roll(vals, shift, axis=1)
            summed = padd(ck, vals, shifted)
            idx = jnp.arange(n)[None, :, None, None]
            vals = jnp.where(idx >= shift, summed, vals)
            return vals, None

        shifts = jnp.asarray([1 << k for k in range(levels)])
        prefix, _ = jax.lax.scan(level, sorted_pts, shifts)

        W, D = bnd_idx.shape
        idx_full = jnp.broadcast_to(bnd_idx[:, :, None, None],
                                    (W, D, 3, prefix.shape[-1]))
        gathered = jnp.take_along_axis(prefix, idx_full, axis=1)
        gathered = jnp.where(bnd_mask[:, :, None, None], gathered,
                             jnp.broadcast_to(ident, gathered.shape))
        # pad D=2^c-1 to 2^c with one identity column, then tree-reduce
        pad = jnp.broadcast_to(ident, gathered[:, :1].shape)
        acc = jnp.concatenate([gathered, pad], axis=1)
        m = acc.shape[1]
        while m > 1:
            half = m // 2
            acc = padd(ck, acc[:, :half], acc[:, half:m])
            m = half
        return acc[:, 0]                              # (W, 3, N)

    return jax.jit(kernel)


def msm_device(ck: CurveKernels, scalars: List[int], points) -> Point:
    """Full MSM; returns an affine host point (or None)."""
    import jax.numpy as jnp

    n = len(scalars)
    assert n >= 1
    if isinstance(points, list):
        points = ck.to_proj(points)
    n2 = 1 << max(0, n - 1).bit_length() if n > 1 else 1
    if n2 != n:
        pad = np.broadcast_to(np.asarray(ck.ident), (n2 - n, 3, limb.N))
        points = np.concatenate([np.asarray(points), pad])
        scalars = list(scalars) + [0] * (n2 - n)
        n = n2

    digs = _digits_np(scalars, ck.curve.order)
    D = (1 << WINDOW_C) - 1
    order = np.zeros((N_WINDOWS, n), np.int32)
    bnd_idx = np.zeros((N_WINDOWS, D), np.int32)
    bnd_mask = np.zeros((N_WINDOWS, D), bool)
    for w in range(N_WINDOWS):
        order[w] = np.argsort(-digs[w].astype(np.int32), kind="stable")
        counts = np.bincount(digs[w], minlength=1 << WINDOW_C)
        # count(digit >= d) for d = D..1
        c_ge = np.cumsum(counts[::-1])[::-1]          # c_ge[d] over d=0..D
        for d in range(1, D + 1):
            cnt = int(c_ge[d])
            bnd_idx[w, d - 1] = max(cnt - 1, 0)
            bnd_mask[w, d - 1] = cnt > 0

    levels = max(1, (n - 1).bit_length())
    kern = _window_kernel(ck, n, levels)
    accs = np.asarray(kern(jnp.asarray(np.asarray(points)),
                           jnp.asarray(order), jnp.asarray(bnd_idx),
                           jnp.asarray(bnd_mask),
                           jnp.asarray(np.asarray(ck.ident))))

    # host combine: sum_w 2^{c*w} * A_w
    cv = ck.curve
    window_pts = ck.to_affine(accs)
    result: Point = None
    for w in reversed(range(N_WINDOWS)):
        for _ in range(WINDOW_C):
            result = cv.double(result)
        result = cv.add(result, window_pts[w])
    return result
