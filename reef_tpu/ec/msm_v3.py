"""Device Pippenger MSM v3: on-device prep, chunk-scanned, upload = scalars.

The v2 kernel (ec.msm_pippenger) prepares per-window sort orders and Fenwick
boundary indices on the HOST and uploads them per call — (W, n) int32 order
arrays alone are 8 MB at n=2^16, and every chunk re-pays the Fenwick+halve
combine.  v3 moves the whole prep onto the chip and restructures the chunk
loop as one lax.scan:

  upload    scalars as (n, 32) uint8 little-endian bytes (the ONLY per-call
            host->device transfer; the basis is resident)
  device    per chunk (lax.scan body, ONE compile for any n):
              1. digits = the 32 LE bytes (c=8 byte windows, W=32)
              2. per-window sort: keys = digit<<20 | lane, jnp.sort,
                 flip -> descending-digit order (stability is irrelevant:
                 bucket sums are commutative)
              3. boundary counts c_ge[w,d] = #digits >= d via batched
                 searchsorted on the ascending keys
              4. gather points into window order, pairwise sum tree
                 (log cap shrinking batched complete-adds)
              5. Fenwick assembly of the 255 boundary prefix sums per
                 window from <= log cap tree nodes (lax.scan over levels,
                 one batched padd body)
              6. accumulate the (W, 256) boundary prefixes into the scan
                 carry with one 8192-lane padd
            after the scan: ONE masked-halving sum over the digit axis
            (the Pippenger running-sum identity sum_d d*B_d =
            sum_{d>=1} prefix[count(digit>=d)-1], linear across chunks)
  download  (W, 3, N) window accumulators (~6 KB)
  host      combine: sum_w 2^{8w} * A_w (a 32-point double-and-add)

Matches the reference's per-fold commit MSM hot spot (framework.rs:668;
commitment.rs:182-187) re-designed for the TPU memory system.
"""

from __future__ import annotations

import functools
import os
from typing import List

import numpy as np

from ..ops import limb
from .msm import CurveKernels, padd
from .pasta import Point

WINDOW_C = 8
N_WINDOWS = 32            # 256 LE bytes cover the 255-bit scalars
D = 255                   # digits 1..255 have bucket boundaries
DP = 256                  # padded digit axis (multiple of 128 lanes)


def scalars_to_bytes(scalars: List[int], order_mod: int) -> np.ndarray:
    """(n, 32) uint8 little-endian scalar bytes (the per-call upload)."""
    n = len(scalars)
    out = np.empty((n, 32), np.uint8)
    for i, s in enumerate(scalars):
        out[i] = np.frombuffer((s % order_mod).to_bytes(32, "little"),
                               np.uint8)
    return out


def _chunk_prefixes(ck: CurveKernels, cap: int):
    """Traced fn: (pts (cap,3,N), scb (cap,32) u8, ident) ->
    (W, DP, 3, N) boundary prefix sums for this chunk (identity where the
    boundary is empty / at the pad lane)."""
    import jax
    import jax.numpy as jnp

    LV = max(1, (cap - 1).bit_length()) + 1     # tree levels 0..log2(cap)
    offs = [0]
    width = cap
    for _ in range(1, LV):
        offs.append(offs[-1] + width)
        width //= 2

    def fn(pts, scb, ident):
        nl = pts.shape[-1]
        digs = scb.T.astype(jnp.uint32)                    # (32, cap)
        lanes = jax.lax.broadcasted_iota(jnp.uint32, (N_WINDOWS, cap), 1)
        keys = jnp.sort((digs << 20) | lanes, axis=1)      # ascending
        asc_digs = keys >> 20                              # (W, cap)
        order_desc = (keys & 0xFFFFF)[:, ::-1].astype(jnp.int32)

        # c_ge[w, d-1] = #lanes with digit >= d, d = 1..255 (+1 pad lane)
        dvals = jnp.arange(1, DP + 1, dtype=jnp.uint32)    # pad d=256 -> 0
        c_ge = cap - jax.vmap(
            lambda row: jnp.searchsorted(row, dvals, side="left"))(asc_digs)
        c_ge = jnp.where(dvals[None, :] <= D, c_ge, 0)     # (W, DP) int

        # Fenwick node index/mask per level (derived on device; v2 uploaded
        # these as (LV, W, D) int32 arrays)
        m = c_ge.astype(jnp.int32)
        lv_idx = []
        lv_mask = []
        for b in range(LV):
            lv_mask.append(((m >> b) & 1).astype(bool))
            cleared = (m >> (b + 1)) << (b + 1)
            lv_idx.append(offs[b] + (cleared >> b))
        lv_idx = jnp.stack(lv_idx)                         # (LV, W, DP)
        lv_mask = jnp.stack(lv_mask)

        sorted_pts = pts[order_desc]                       # (W, cap, 3, N)

        # pairwise-sum tree over the sorted points
        levels = [sorted_pts]
        cur = sorted_pts
        while cur.shape[1] > 1:
            cur = padd(ck, cur[:, 0::2], cur[:, 1::2])
            levels.append(cur)
        flat = jnp.concatenate(levels, axis=1)             # (W, 2cap-1,3,N)

        def fenwick(acc, lvl):
            idx, mask = lvl
            gi = jnp.broadcast_to(idx[:, :, None, None],
                                  (N_WINDOWS, DP, 3, nl))
            g = jnp.take_along_axis(flat, gi, axis=1)
            summed = padd(ck, acc, g)
            return jnp.where(mask[:, :, None, None], summed, acc), None

        acc0 = jnp.broadcast_to(ident, (N_WINDOWS, DP, 3, nl))
        acc, _ = jax.lax.scan(fenwick, acc0, (lv_idx, lv_mask))
        return acc

    return fn


def _halve_digits(ck: CurveKernels, acc):
    """Sum the DP boundary prefixes per window: masked-halving scan with a
    single batched point-add body -> (W, 3, N)."""
    import jax
    import jax.numpy as jnp

    pos = jnp.arange(DP)[None, :, None, None]

    def halve(carry, shift):
        shifted = jnp.roll(carry, -shift, axis=1)
        summed = padd(ck, carry, shifted)
        return jnp.where(pos < shift, summed, carry), None

    shifts = jnp.asarray([DP >> k for k in range(1, DP.bit_length())])
    acc, _ = jax.lax.scan(halve, acc, shifts)
    return acc[:, 0]


def _kernel_fn(ck: CurveKernels, cap: int, n_chunks: int):
    import jax
    import jax.numpy as jnp

    chunk = _chunk_prefixes(ck, cap)

    def fn(pts, scb, ident):
        # pts (n_chunks, cap, 3, N); scb (n_chunks, cap, 32)
        nl = pts.shape[-1]
        acc0 = jnp.broadcast_to(ident, (N_WINDOWS, DP, 3, nl))
        if n_chunks == 1:
            acc = chunk(pts[0], scb[0], ident)
        else:
            def body(acc, xs):
                p, s = xs
                return padd(ck, acc, chunk(p, s, ident)), None
            acc, _ = jax.lax.scan(body, acc0, (pts, scb))
        return _halve_digits(ck, acc)                      # (W, 3, N)

    return fn


@functools.lru_cache(maxsize=None)
def _kernel_jit(ck: CurveKernels, cap: int, n_chunks: int):
    import jax
    return jax.jit(_kernel_fn(ck, cap, n_chunks))


def combine_windows(ck: CurveKernels, accs) -> Point:
    """Host combine: sum_w 2^{8w} * A_w (A_31 is always identity for
    255-bit scalars but participates for shape regularity)."""
    cv = ck.curve
    window_pts = ck.to_affine(accs)
    result: Point = None
    for w in reversed(range(N_WINDOWS)):
        for _ in range(WINDOW_C):
            result = cv.double(result)
        result = cv.add(result, window_pts[w])
    return result


def default_cap() -> int:
    cap = int(os.environ.get("REEF_DEVICE_MSM_CHUNK", "8192"))
    return max(128, 1 << (cap - 1).bit_length())


class DeviceBasisV3:
    """Device-resident basis pre-shaped (n_chunks, cap, 3, N) for the
    chunk-scanned kernel (one upload per gens set)."""

    def __init__(self, ck: CurveKernels, points, cap: int = 0):
        import jax
        import jax.numpy as jnp
        self.ck = ck
        self.cap = cap or default_cap()
        if isinstance(points, list):
            points = ck.to_proj(points)
        points = np.asarray(points)
        self.n = points.shape[0]
        n2 = 1 << max(0, self.n - 1).bit_length() if self.n > 1 else 1
        n2 = max(n2, min(self.cap, 128))
        self.cap = min(self.cap, n2)
        if n2 != self.n:
            pad = np.broadcast_to(np.asarray(ck.ident),
                                  (n2 - self.n, 3, limb.N))
            points = np.concatenate([points, pad])
        self.n2 = n2
        self.n_chunks = n2 // self.cap
        self.arr = jax.device_put(jnp.asarray(
            points.reshape(self.n_chunks, self.cap, 3, limb.N)))


def msm_device_v3(ck: CurveKernels, scalars: List[int], points) -> Point:
    """Full MSM; `points` is a DeviceBasisV3 (resident; the production
    shape) or a host list/array (uploaded per call)."""
    import jax
    import jax.numpy as jnp

    n = len(scalars)
    assert n >= 1
    if not isinstance(points, DeviceBasisV3):
        points = DeviceBasisV3(ck, points)
    assert n <= points.n2
    scb = np.zeros((points.n2, 32), np.uint8)
    scb[:n] = scalars_to_bytes(list(scalars), ck.curve.order)

    use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        from ..ops import limb as _limb
        from ..ops import pallas_field
        prev_mul = _limb.mul
        prev_thr = pallas_field._THRESHOLD
        pallas_field.enable(threshold=min(prev_thr, 2048))
    try:
        kern = _kernel_jit(ck, points.cap, points.n_chunks)
        accs = np.asarray(kern(
            points.arr,
            jnp.asarray(scb.reshape(points.n_chunks, points.cap, 32)),
            jnp.asarray(np.asarray(ck.ident))))
    finally:
        if use_pallas:
            _limb.mul = prev_mul
            pallas_field._THRESHOLD = prev_thr
    return combine_windows(ck, accs)
