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
         4. BLOCKED inclusive prefix point-sum over the n axis: in-group
            Hillis-Steele over groups of G (log2(G) levels at full batch)
            + Hillis-Steele over the n/G group totals (log2(n/G) levels at
            1/G batch); prefix[p] = group_offset[p//G] + in_group[p//G,
            p%G].  Work ~ n*log2(G) + (n/G)*log2(n/G) complete adds vs the
            flat scan's n*log2(n) (~3.4x fewer at n=2^16, G=16), with
            scan bodies of ONE batched complete-add each (the graph shape
            proven safe on the tunneled compiler).
         5. gather the 2^c - 1 boundary prefix sums per window, mask empty
            ones to the identity, sum them with a masked-halving scan
            (log2 levels, one padd body)
            -> one accumulated point per window:  A_w = sum_d d * B_{w,d}
            (Pippenger's running-sum identity: with points sorted by digit
            descending, sum_d d*B_d = sum_{d>=1} prefix[count(digit>=d)-1])
  host   6. combine: result = sum_w 2^{c*w} * A_w  (a 32-point host MSM)
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


def window_kernel_fn(ck: CurveKernels, n: int, levels: int):
    """Raw (unjitted) per-window accumulation kernel — also the local shard
    body of the mesh-sharded MSM (parallel.mesh.sharded_msm)."""
    import jax
    import jax.numpy as jnp

    G = 16 if n >= 256 else n                         # group size
    ng = n // G

    def _hs_prefix(vals, axis, length):
        """Hillis-Steele inclusive prefix point-sum along `axis` (static
        length); scan with a one-padd body."""
        if length == 1:
            return vals
        lv = max(1, (length - 1).bit_length())
        pos = jnp.arange(length).reshape(
            [length if a == axis else 1 for a in range(vals.ndim)])

        def level(carry, shift):
            shifted = jnp.roll(carry, shift, axis=axis)
            summed = padd(ck, carry, shifted)
            return jnp.where(pos >= shift, summed, carry), None

        shifts = jnp.asarray([1 << k for k in range(lv)])
        out, _ = jax.lax.scan(level, vals, shifts)
        return out

    def kernel(pts, order, bnd_idx, bnd_mask, ident):
        # pts (n,3,N); order (W,n); bnd_idx (W,D); bnd_mask (W,D)
        sorted_pts = pts[order]                       # (W, n, 3, N)
        W, D = bnd_idx.shape
        nl = sorted_pts.shape[-1]

        grp = sorted_pts.reshape(W, ng, G, 3, nl)
        in_grp = _hs_prefix(grp, 2, G)                # in-group prefixes
        if ng > 1:
            totals = in_grp[:, :, -1]                 # (W, ng, 3, N)
            incl = _hs_prefix(totals, 1, ng)
            # exclusive group offsets: offset[g] = incl[g-1], offset[0]=id
            excl = jnp.concatenate(
                [jnp.broadcast_to(ident, (W, 1, 3, nl)), incl[:, :-1]],
                axis=1)                               # (W, ng, 3, N)
        in_flat = in_grp.reshape(W, n, 3, nl)

        idx_full = jnp.broadcast_to(bnd_idx[:, :, None, None],
                                    (W, D, 3, nl))
        part = jnp.take_along_axis(in_flat, idx_full, axis=1)
        if ng > 1:
            gi = jnp.broadcast_to((bnd_idx // G)[:, :, None, None],
                                  (W, D, 3, nl))
            offs = jnp.take_along_axis(excl, gi, axis=1)
            gathered = padd(ck, part, offs)           # boundary prefixes
        else:
            gathered = part
        gathered = jnp.where(bnd_mask[:, :, None, None], gathered,
                             jnp.broadcast_to(ident, gathered.shape))

        # sum the D boundary points per window: masked-halving scan with a
        # single batched point-add body (an unrolled tree reduce is a
        # compile-time bomb; one-padd bodies are the proven-safe shape)
        D2 = 1 << max(0, (D - 1).bit_length())
        if D2 != D:
            padc = jnp.broadcast_to(ident, (W, D2 - D, 3, nl))
            gathered = jnp.concatenate([gathered, padc], axis=1)
        pos = jnp.arange(D2)[None, :, None, None]

        def halve(carry, shift):
            shifted = jnp.roll(carry, -shift, axis=1)
            summed = padd(ck, carry, shifted)
            return jnp.where(pos < shift, summed, carry), None

        shifts = jnp.asarray([D2 >> k for k in range(1, D2.bit_length())])
        acc, _ = jax.lax.scan(halve, gathered, shifts)
        return acc[:, 0]                              # (W, 3, N)

    return kernel


@functools.lru_cache(maxsize=None)
def _window_kernel(ck: CurveKernels, n: int, levels: int):
    import jax
    return jax.jit(window_kernel_fn(ck, n, levels))


def _sorted_digit_counts(scalars: List[int], order_mod: int, n: int):
    """Shared host prep: per-window descending-digit stable sort order and
    the >=d boundary counts (c_ge[d] = #points with digit >= d)."""
    digs = _digits_np(scalars, order_mod)
    order = np.zeros((N_WINDOWS, n), np.int32)
    c_ge_all = np.zeros((N_WINDOWS, 1 << WINDOW_C), np.int64)
    for w in range(N_WINDOWS):
        order[w] = np.argsort(-digs[w].astype(np.int32), kind="stable")
        counts = np.bincount(digs[w], minlength=1 << WINDOW_C)
        c_ge_all[w] = np.cumsum(counts[::-1])[::-1]
    return order, c_ge_all


def window_prep(scalars: List[int], order_mod: int, n: int):
    """Host-side digit/sort/boundary prep shared by the single-chip and
    sharded MSMs: returns (order (W,n) int32, bnd_idx (W,D), bnd_mask)."""
    D = (1 << WINDOW_C) - 1
    order, c_ge_all = _sorted_digit_counts(scalars, order_mod, n)
    bnd_idx = np.zeros((N_WINDOWS, D), np.int32)
    bnd_mask = np.zeros((N_WINDOWS, D), bool)
    for w in range(N_WINDOWS):
        c_ge = c_ge_all[w]
        for d in range(1, D + 1):
            cnt = int(c_ge[d])
            bnd_idx[w, d - 1] = max(cnt - 1, 0)
            bnd_mask[w, d - 1] = cnt > 0
    return order, bnd_idx, bnd_mask


def window_prep_v2(scalars: List[int], order_mod: int, n: int):
    """Host prep for the tree+Fenwick kernel: per-window sort order plus,
    for every (window, digit) boundary count m = #points with digit >= d,
    the Fenwick decomposition of the prefix-sum over the first m sorted
    points: node indices into the per-window flat tree-level array and a
    per-level participation mask.

    Tree levels: level 0 = the n sorted points, level b = pairwise sums
    (width n >> b), concatenated at offsets off_b = 2n - (n >> (b-1))
    ... i.e. off_0 = 0, off_{b} = off_{b-1} + (n >> (b-1)).  The prefix of
    the first m elements = sum over set bits b of m of the level-b node at
    index ((m >> (b+1)) << 1) | ... = (m_cleared >> b) where m_cleared
    clears bits <= b."""
    D = (1 << WINDOW_C) - 1
    LV = max(1, (n - 1).bit_length()) + 1          # levels 0..log2(n)
    order, c_ge_all = _sorted_digit_counts(scalars, order_mod, n)
    counts_m = c_ge_all[:, 1:]                     # m for digits 1..D
    # level offsets in the flat concatenated tree array
    offs = np.zeros(LV, np.int64)
    width = n
    for b in range(1, LV):
        offs[b] = offs[b - 1] + width
        width //= 2
    # digit axis padded 255 -> 256 (mask False) so every kernel batch is a
    # multiple of 128 lanes — the Pallas per-mul dispatch requirement
    Dp = D + 1
    lv_idx = np.zeros((LV, N_WINDOWS, Dp), np.int32)
    lv_mask = np.zeros((LV, N_WINDOWS, Dp), bool)
    for b in range(LV):
        bit = (counts_m >> b) & 1
        lv_mask[b, :, :D] = bit.astype(bool)
        cleared = (counts_m >> (b + 1)) << (b + 1)  # clear bits <= b
        lv_idx[b, :, :D] = (offs[b] + (cleared >> b)).astype(np.int32)
    return order, lv_idx, lv_mask


def window_kernel_v2_fn(ck: CurveKernels, n: int):
    """Tree+Fenwick window accumulation: per window, build the pairwise
    sum tree over the digit-sorted points (n-1 adds, log n shrinking
    batched levels), then assemble each of the D boundary prefix sums from
    <= log n tree nodes (a lax.scan over stacked per-level gathers, one
    padd body).  ~32n total padd lanes vs the prefix-scan kernel's ~147n."""
    import jax
    import jax.numpy as jnp

    LV = max(1, (n - 1).bit_length()) + 1

    def kernel(pts, order, lv_idx, lv_mask, ident):
        # pts (n,3,N); order (W,n); lv_idx/lv_mask (LV,W,D)
        sorted_pts = pts[order]                        # (W, n, 3, N)
        W = order.shape[0]
        D = lv_idx.shape[-1]
        nl = sorted_pts.shape[-1]

        levels = [sorted_pts]
        cur = sorted_pts
        while cur.shape[1] > 1:
            cur = padd(ck, cur[:, 0::2], cur[:, 1::2])
            levels.append(cur)
        flat = jnp.concatenate(levels, axis=1)         # (W, 2n-1, 3, N)

        def fenwick(acc, lvl):
            idx, mask = lvl
            gi = jnp.broadcast_to(idx[:, :, None, None], (W, D, 3, nl))
            g = jnp.take_along_axis(flat, gi, axis=1)
            summed = padd(ck, acc, g)
            return jnp.where(mask[:, :, None, None], summed, acc), None

        acc0 = jnp.broadcast_to(ident, (W, D, 3, nl))
        acc, _ = jax.lax.scan(fenwick, acc0, (lv_idx, lv_mask))

        # sum the D boundary prefixes per window (masked-halving scan);
        # empty boundaries never passed a fenwick mask and stay identity
        D2 = 1 << max(0, (D - 1).bit_length())
        if D2 != D:
            padc = jnp.broadcast_to(ident, (W, D2 - D, 3, nl))
            acc = jnp.concatenate([acc, padc], axis=1)
        pos = jnp.arange(D2)[None, :, None, None]

        def halve(carry, shift):
            shifted = jnp.roll(carry, -shift, axis=1)
            summed = padd(ck, carry, shifted)
            return jnp.where(pos < shift, summed, carry), None

        shifts = jnp.asarray([D2 >> k for k in range(1, D2.bit_length())])
        acc, _ = jax.lax.scan(halve, acc, shifts)
        return acc[:, 0]                               # (W, 3, N)

    return kernel


@functools.lru_cache(maxsize=None)
def _window_kernel_v2(ck: CurveKernels, n: int):
    import jax
    return jax.jit(window_kernel_v2_fn(ck, n))


class DeviceBasis:
    """Device-resident fixed MSM basis.

    The production MSMs (Pedersen witness commits per fold, the IPA's
    packed basis) reuse ONE basis for the whole run; the tunneled TPU
    moves ~1.4 MB/s host->device, so re-uploading the (n, 3, N) point
    array per MSM (100 MB at n=2^14) dwarfs the kernel.  Upload once,
    keep the padded array on device, and pad scalars per call (zero
    scalars contribute nothing: their digits sort last, past every
    bucket boundary)."""

    def __init__(self, ck: CurveKernels, points):
        import jax
        import jax.numpy as jnp
        self.ck = ck
        if isinstance(points, list):
            points = ck.to_proj(points)
        points = np.asarray(points)
        n = points.shape[0]
        self.n = n
        n2 = 1 << max(0, n - 1).bit_length() if n > 1 else 1
        if n2 != n:
            pad = np.broadcast_to(np.asarray(ck.ident), (n2 - n, 3, limb.N))
            points = np.concatenate([points, pad])
        self.n2 = n2
        self.arr = jax.device_put(jnp.asarray(points))


def combine_windows(ck: CurveKernels, accs) -> Point:
    """Host combine: sum_w 2^{c*w} * A_w."""
    cv = ck.curve
    window_pts = ck.to_affine(accs)
    result: Point = None
    for w in reversed(range(N_WINDOWS)):
        for _ in range(WINDOW_C):
            result = cv.double(result)
        result = cv.add(result, window_pts[w])
    return result


def msm_device(ck: CurveKernels, scalars: List[int], points) -> Point:
    """Full MSM; returns an affine host point (or None).

    `points` may be a host list/array (uploaded per call) or a DeviceBasis
    (fixed basis resident on device; only the O(n) int32 index arrays move
    per call)."""
    import jax.numpy as jnp

    n = len(scalars)
    assert n >= 1
    if isinstance(points, DeviceBasis):
        assert n <= points.n2
        scalars = list(scalars) + [0] * (points.n2 - n)
        n = points.n2
        pts_dev = points.arr
    else:
        if isinstance(points, list):
            points = ck.to_proj(points)
        n2 = 1 << max(0, n - 1).bit_length() if n > 1 else 1
        if n2 != n:
            pad = np.broadcast_to(np.asarray(ck.ident),
                                  (n2 - n, 3, limb.N))
            points = np.concatenate([np.asarray(points), pad])
            scalars = list(scalars) + [0] * (n2 - n)
            n = n2
        pts_dev = jnp.asarray(np.asarray(points))

    # On real TPU, route the padd field muls through the Pallas Montgomery
    # kernel (the 539k perm/s Poseidon path); the digit axis is padded to
    # 256 so every scan batch is a multiple of 128 lanes.  Enable/disable
    # only affects tracing; the jitted kernel is cached per (ck, n).
    import jax
    use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        # route through the Pallas mul for this trace, then restore the
        # CALLER's dispatch state (an unconditional disable() here would
        # silently strip a host app's own enable())
        from ..ops import limb as _limb
        from ..ops import pallas_field
        prev_mul = _limb.mul
        prev_thr = pallas_field._THRESHOLD
        pallas_field.enable(threshold=min(prev_thr, 2048))
    try:
        # CHUNKING lifts the size limit: the tunneled compile service
        # wedges on window kernels past n=2^13, so larger MSMs run the
        # already-compiled chunk-sized kernel repeatedly and accumulate
        # the per-window points with one batched device padd per chunk.
        # no_persistent_cache: XLA:CPU cannot round-trip these big limb
        # executables (cache reads segfault) — recompile per process.
        import os
        from .msm import no_persistent_cache
        cap = int(os.environ.get("REEF_DEVICE_MSM_CHUNK", "8192"))
        cap = max(2, 1 << (cap - 1).bit_length())
        with no_persistent_cache():
            if n <= cap:
                accs = _msm_accs(ck, scalars, pts_dev, n)
            else:
                assert n % cap == 0        # both are powers of two
                add = _accs_add_jit(ck)
                accs_dev = None
                for k in range(n // cap):
                    a = _msm_accs(ck, scalars[k * cap:(k + 1) * cap],
                                  pts_dev[k * cap:(k + 1) * cap], cap,
                                  as_device=True)
                    accs_dev = a if accs_dev is None else add(accs_dev, a)
                accs = np.asarray(accs_dev)
    finally:
        if use_pallas:
            _limb.mul = prev_mul
            pallas_field._THRESHOLD = prev_thr
    return combine_windows(ck, accs)


def _msm_accs(ck: CurveKernels, scalars: List[int], pts_dev, n: int,
              as_device: bool = False):
    """Per-window accumulator points (W, 3, N) for one kernel-sized MSM."""
    import jax.numpy as jnp

    order, lv_idx, lv_mask = window_prep_v2(scalars, ck.curve.order, n)
    kern = _window_kernel_v2(ck, n)
    out = kern(pts_dev, jnp.asarray(order), jnp.asarray(lv_idx),
               jnp.asarray(lv_mask), jnp.asarray(np.asarray(ck.ident)))
    return out if as_device else np.asarray(out)


@functools.lru_cache(maxsize=None)
def _accs_add_jit(ck: CurveKernels):
    import jax
    return jax.jit(functools.partial(padd, ck))
