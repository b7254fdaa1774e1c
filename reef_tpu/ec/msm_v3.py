"""Device Pippenger MSM v3: fused-padd, on-device prep, chunk-scanned.

The v2 kernel (ec.msm_pippenger) composes every point add from ~29 XLA limb
ops (unrolled 16-limb carry chains), so its per-size jits are huge graphs —
exactly what wedges the tunneled compile service — and it uploads (W, n)
int32 sort orders + Fenwick index arrays per call (8 MB at n=2^16).  v3
fixes both:

  - the point-add primitive is the FUSED Pallas kernel (pallas_ec.padd_soa:
    the whole RCB complete addition in one Mosaic kernel) — measured
    31M padd-lanes/s at 262k lanes on the v5e, and each padd is ONE custom
    call in the XLA graph instead of ~29 ops (30x smaller graphs);
  - ALL host prep moves onto the chip: digits are the scalar's LE bytes
    (c=8 byte windows), per-window descending sort via jnp.sort of
    digit<<20|lane keys, boundary counts via batched searchsorted, Fenwick
    node indices by bit arithmetic — the only per-call upload is the
    (n, 32) uint8 scalar bytes;
  - the chunk loop is a lax.scan accumulating (W, 256) boundary prefix
    sums (linear across chunks), with ONE masked-halving digit sum after
    the scan — one compile for any n at a fixed chunk cap, one device
    program launch per MSM (the tunnel costs ~0.6-2 ms per launch).

Pipeline per MSM (basis resident; Pippenger running-sum identity
sum_d d*B_d = sum_{d>=1} prefix[count(digit>=d)-1]):

  upload scalar bytes -> per chunk: sort / counts / gather / pairwise-sum
  tree (log cap fused padds) / Fenwick boundary assembly (lax.scan, one
  padd body) / accumulate -> halve digit axis -> download (W,3,N) ~6 KB ->
  host 32-point combine.

Matches the reference's per-fold commit MSM hot spot (framework.rs:668;
commitment.rs:182-187) re-designed for the TPU memory system.

Layout note: points are SoA (3, N, B) — coordinate-major, limbs-major,
batch on lanes (pallas_ec's native layout), so tree levels and digit-axis
ops are pure last-axis slices/reshapes.
"""

from __future__ import annotations

import functools
import os
from typing import List

import numpy as np

from ..ops import limb
from .msm import CurveKernels
from .pasta import Point

WINDOW_C = 8
N_WINDOWS = 32            # 32 LE bytes cover the 255-bit scalars
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


def _padd3(ck: CurveKernels, use_fused: bool):
    """Point-add on SoA (3, N, B) arrays; fused Pallas kernel on TPU,
    composed XLA limb ops elsewhere (CPU tests)."""
    if use_fused:
        from .pallas_ec import padd_soa

        def fn(P, Q):
            shape = P.shape
            B = int(np.prod(shape[2:]))
            out = padd_soa(ck, P.reshape(3, limb.N, B),
                           Q.reshape(3, limb.N, B))
            return out.reshape(shape)
    else:
        from .msm import padd

        def fn(P, Q):
            import jax.numpy as jnp
            shape = P.shape
            B = int(np.prod(shape[2:]))
            Pa = jnp.moveaxis(P.reshape(3, limb.N, B), -1, 0)
            Qa = jnp.moveaxis(Q.reshape(3, limb.N, B), -1, 0)
            out = padd(ck, Pa, Qa)
            return jnp.moveaxis(out, 0, -1).reshape(shape)
    return fn


def _bitrev_np(n: int) -> np.ndarray:
    """Bit-reversal permutation of [0, n), n a power of two."""
    bits = (n - 1).bit_length()
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, np.int64)
    for i in range(bits):
        rev |= ((idx >> i) & 1) << (bits - 1 - i)
    return rev


def _bitrev_jnp(k, t: int):
    """Bit-reverse the low t bits of each element of k (values < 2^t)."""
    import jax.numpy as jnp
    r = jnp.zeros_like(k)
    for i in range(t):
        r = r | (((k >> i) & 1) << (t - 1 - i))
    return r


def _kernel_levels(cap: int) -> List[int]:
    """Output widths (in 128-lane rows) of the in-kernel tree levels:
    halving from cap/2 lanes while the output still fills >= one (8,128)
    tile AND all sublane offsets stay 8-aligned."""
    rows = cap // 128
    out = []
    w = rows
    while w // 2 >= 8:
        out.append(w // 2)
        w //= 2
    return out


def _tree_body(ck: CurveKernels, klevels, p_ref, o_ref):
    """Fused pairwise-sum tree for ONE window: p_ref (2,N,1,rows,128)
    bit-reversal-placed affine basis points (X, Y only — every basis
    lane has Z = 1 because DeviceBasisV3 pads with zero-scalar
    generators); o_ref (3,N,1,rows_used,128) holds the kernel levels
    concatenated.  With bit-reversed placement the even/odd pairing of
    sorted order becomes first-half + second-half — contiguous sublane
    slices, the only slicing Mosaic does at full speed.  Level 1 uses
    the 10-mul affine-affine specialization."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from .pallas_ec import padd_affine_tiles, padd_tiles

    pl_ds = pl.ds
    SUBR = 8

    def lanes(t, k):
        return [t[k, i] for i in range(limb.N)]

    def level1(half):
        def blk(c, _):
            a = p_ref[:, :, 0, pl_ds(c * SUBR, SUBR), :]
            b = p_ref[:, :, 0, pl_ds(half + c * SUBR, SUBR), :]
            X3, Y3, Z3 = padd_affine_tiles(
                ck, lanes(a, 0), lanes(a, 1), lanes(b, 0), lanes(b, 1))
            o_ref[:, :, 0, pl_ds(c * SUBR, SUBR), :] = jnp.stack(
                [jnp.stack(X3), jnp.stack(Y3), jnp.stack(Z3)])
            return 0
        return blk

    def level(s0, half, d0):
        def blk(c, _):
            a = o_ref[:, :, 0, pl_ds(s0 + c * SUBR, SUBR), :]
            b = o_ref[:, :, 0, pl_ds(s0 + half + c * SUBR, SUBR), :]
            X3, Y3, Z3 = padd_tiles(
                ck, lanes(a, 0), lanes(a, 1), lanes(a, 2),
                lanes(b, 0), lanes(b, 1), lanes(b, 2))
            o_ref[:, :, 0, pl_ds(d0 + c * SUBR, SUBR), :] = jnp.stack(
                [jnp.stack(X3), jnp.stack(Y3), jnp.stack(Z3)])
            return 0
        return blk

    s_off, d_off = 0, 0
    for li, out_rows in enumerate(klevels):
        blk = level1(out_rows) if li == 0 else level(s_off, out_rows, d_off)
        nb = out_rows // SUBR
        if nb > 1:
            jax.lax.fori_loop(0, nb, blk, 0)
        else:
            blk(0, 0)
        s_off = d_off
        d_off += out_rows


@functools.lru_cache(maxsize=None)
def _tree_call(ck: CurveKernels, cap: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = cap // 128
    klevels = _kernel_levels(cap)
    rows_used = sum(klevels)
    in_spec = pl.BlockSpec((2, limb.N, 1, rows, 128),
                           lambda w: (0, 0, w, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((3, limb.N, 1, rows_used, 128),
                            lambda w: (0, 0, w, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tree_body, ck, tuple(klevels)),
        out_shape=jax.ShapeDtypeStruct(
            (3, limb.N, N_WINDOWS, rows_used, 128), jnp.uint32),
        grid=(N_WINDOWS,),
        in_specs=[in_spec],
        out_specs=out_spec,
    )


def _chunk_prefixes(ck: CurveKernels, cap: int, padd3, fused_tree: bool):
    """Traced fn: (pts (3,N,cap), scb (cap,32) u8, acc (3,N,W,DP)) ->
    acc + this chunk's boundary prefix sums.

    TPU path (fused_tree): points gather directly into the
    blocked (3,N,W,rows,128) layout in BIT-REVERSED placement and the
    pairwise tree runs as ONE Pallas kernel per chunk (grid over windows,
    VMEM-resident levels) — the XLA-composed tree paid ~15us of pipeline
    overhead plus relayout copies per level per chunk.  Tail levels
    (width < 128 lanes) and the Fenwick boundary-prefix assembly stay in
    XLA.  Node k of level b lives at lane bitrev(k) of that level, so the
    Fenwick indices bit-reverse `cleared >> b` (see _tree_body)."""
    import jax
    import jax.numpy as jnp

    LV = max(1, (cap - 1).bit_length()) + 1     # tree levels 0..log2(cap)
    LOG = LV - 1

    if fused_tree:
        klevels = _kernel_levels(cap)
        rows_used = sum(klevels)
        # offsets into flat = concat(kernel levels, XLA tail levels);
        # level 0 (single sorted points) is gathered straight from the
        # basis via a double-index lookup, never materialized
        offs = [0]                      # placeholder for level 0
        run = 0
        for r in klevels:               # kernel levels 1..len(klevels)
            offs.append(run)
            run += r * 128
        tail_w = klevels[-1] * 128 // 2
        w = tail_w
        while w >= 1:                   # XLA tail levels
            offs.append(run)
            run += w
            w //= 2
        assert len(offs) == LV and run == cap - 1
        brev_cap = _bitrev_np(cap)
    else:
        offs = [0]
        width = cap
        for _ in range(1, LV):
            offs.append(offs[-1] + width)
            width //= 2

    def fn(pts, scb, acc):
        digs = scb.T.astype(jnp.uint32)                    # (32, cap)
        lanes = jax.lax.broadcasted_iota(jnp.uint32, (N_WINDOWS, cap), 1)
        keys = jnp.sort((digs << 20) | lanes, axis=1)      # ascending
        asc_digs = keys >> 20                              # (W, cap)
        order_desc = (keys & 0xFFFFF)[:, ::-1].astype(jnp.int32)

        # c_ge[w, d-1] = #lanes with digit >= d, d = 1..255 (+1 pad lane)
        dvals = jnp.arange(1, DP + 1, dtype=jnp.uint32)
        c_ge = cap - jax.vmap(
            lambda row: jnp.searchsorted(row, dvals, side="left"))(asc_digs)
        c_ge = jnp.where(dvals[None, :] <= D, c_ge, 0)     # (W, DP)

        # Fenwick node index/mask per level (v2 uploaded these per call)
        m = c_ge.astype(jnp.int32)
        lv_idx = []
        lv_mask = []
        for b in range(LV):
            lv_mask.append(((m >> b) & 1).astype(bool))
            cleared = (m >> (b + 1)) << (b + 1)
            k = cleared >> b
            if fused_tree:
                k = _bitrev_jnp(k, LOG - b)
            lv_idx.append(offs[b] + k)
        lv_idx = jnp.stack(lv_idx)                         # (LV, W, DP)
        lv_mask = jnp.stack(lv_mask)

        if fused_tree:
            order_placed = jnp.take(order_desc, jnp.asarray(brev_cap),
                                    axis=1)                # (W, cap)
            idx5 = order_placed.reshape(N_WINDOWS, cap // 128, 128)
            placed5 = jnp.take(pts[:2], idx5, axis=-1)  # (2,N,W,rows,128)
            kern5 = _tree_call(ck, cap)(placed5)
            kern4 = kern5.reshape(3, limb.N, N_WINDOWS, rows_used * 128)
            levels = [kern4]
            cur = kern4[..., (rows_used - klevels[-1]) * 128:]
            w = cur.shape[-1]
            while w > 1:
                cur = padd3(cur[..., :w // 2], cur[..., w // 2:])
                levels.append(cur)
                w //= 2
            flat = jnp.concatenate(levels, axis=-1)   # (3,N,W,cap-1)

            ident = jnp.asarray(np.asarray(ck.ident))      # (3, N)
            ident_b = ident[:, :, None, None, None]
            # level 0: single sorted points, gathered (X, Y) straight
            # from the basis through the sort order; Z = 1 for every
            # basis lane (zero-scalar generator padding)
            k0 = jnp.clip((m >> 1) << 1, 0, cap - 1)
            pt_idx = jnp.take_along_axis(order_desc, k0, axis=1)
            g0xy = jnp.take(pts[:2], pt_idx.reshape(-1), axis=-1)
            g0xy = g0xy.reshape(2, limb.N, N_WINDOWS, DP)
            one = jnp.asarray(ck.lf.one_mont)[:, None, None]
            g0 = jnp.concatenate(
                [g0xy, jnp.broadcast_to(one, (1,) + g0xy.shape[1:])],
                axis=0)                                    # (3,N,W,DP)
            g0 = jnp.where(lv_mask[0][None, None], g0, ident_b[..., 0, :])

            # ONE gather for the other levels' nodes + a pairwise reduce
            # over the level axis: same padd-lane count as a 15-step
            # Fenwick scan but 4 padd launches instead of 15 and one
            # gather instead of 15 (each XLA op pays the ~15us pipeline
            # floor, probe_mul_stream phase 3).
            idx_r = lv_idx[1:].transpose(1, 0, 2).reshape(
                N_WINDOWS, (LV - 1) * DP)
            g = jnp.take_along_axis(flat, idx_r[None, None], axis=-1)
            g = g.reshape(3, limb.N, N_WINDOWS, LV - 1, DP)
            g = jnp.where(lv_mask[1:].transpose(1, 0, 2)[None, None], g,
                          ident_b)
            g = jnp.concatenate([g0[..., None, :], g], axis=3)
            L = 1 << (LV - 1).bit_length()                 # pad 15 -> 16
            if L != LV:
                pad = jnp.broadcast_to(
                    ident_b, (3, limb.N, N_WINDOWS, L - LV, DP))
                g = jnp.concatenate([g, pad], axis=3)
            while L > 1:
                half = L // 2
                g = padd3(g[..., :half, :], g[..., half:, :])
                L = half
            return padd3(acc, g[..., 0, :])
        else:
            # gather into window order: flattened (W*cap) take on the
            # lane axis keeps window-major order with NO transposes
            sorted_pts = jnp.take(pts, order_desc.reshape(-1), axis=-1)
            sorted_pts = sorted_pts.reshape(3, limb.N, N_WINDOWS, cap)

            # pairwise-sum tree (log cap padds, shrinking lane counts)
            levels = [sorted_pts]
            cur = sorted_pts
            while cur.shape[-1] > 1:
                cur = padd3(cur[..., 0::2], cur[..., 1::2])
                levels.append(cur)
            flat = jnp.concatenate(levels, axis=-1)   # (3,N,W,2cap-1)

        def fenwick(a, lvl):
            idx, mask = lvl                           # (W, DP)
            g = jnp.take_along_axis(flat, idx[None, None, :, :], axis=-1)
            summed = padd3(a, g)
            return jnp.where(mask[None, None, :, :], summed, a), None

        out, _ = jax.lax.scan(fenwick, acc, (lv_idx, lv_mask))
        return out

    return fn


def _halve_digits(padd3, acc):
    """Sum the DP boundary prefixes per window: masked-halving scan with a
    single fused padd body.  acc (3,N,W,DP) -> (3,N,W)."""
    import jax
    import jax.numpy as jnp

    pos = jnp.arange(DP)[None, None, None, :]

    def halve(carry, shift):
        shifted = jnp.roll(carry, -shift, axis=-1)
        summed = padd3(carry, shifted)
        return jnp.where(pos < shift, summed, carry), None

    shifts = jnp.asarray([DP >> k for k in range(1, DP.bit_length())])
    acc, _ = jax.lax.scan(halve, acc, shifts)
    return acc[..., 0]


def _kernel_fn(ck: CurveKernels, cap: int, n_chunks: int, use_fused: bool,
               tree_ok: bool = True):
    import jax
    import jax.numpy as jnp

    padd3 = _padd3(ck, use_fused)
    chunk = _chunk_prefixes(ck, cap, padd3,
                            use_fused and tree_ok and cap >= 4096)

    def fn(pts, scb, ident_soa):
        # pts (n_chunks, 3, N, cap); scb (n_chunks, cap, 32);
        # ident_soa (3, N)
        acc0 = jnp.broadcast_to(ident_soa[:, :, None, None],
                                (3, limb.N, N_WINDOWS, DP))
        if n_chunks == 1:
            acc = chunk(pts[0], scb[0], acc0)
        else:
            def body(a, xs):
                p, s = xs
                return chunk(p, s, a), None
            acc, _ = jax.lax.scan(body, acc0, (pts, scb))
        return _halve_digits(padd3, acc)             # (3, N, W)

    return fn


@functools.lru_cache(maxsize=None)
def _kernel_jit(ck: CurveKernels, cap: int, n_chunks: int, use_fused: bool,
                tree_ok: bool = True):
    import jax
    return jax.jit(_kernel_fn(ck, cap, n_chunks, use_fused, tree_ok))


def combine_windows(ck: CurveKernels, accs_soa) -> Point:
    """Host combine: sum_w 2^{8w} * A_w.  accs_soa (3, N, W) numpy."""
    cv = ck.curve
    window_pts = ck.to_affine(np.transpose(accs_soa, (2, 0, 1)))
    result: Point = None
    for w in reversed(range(N_WINDOWS)):
        for _ in range(WINDOW_C):
            result = cv.double(result)
        result = cv.add(result, window_pts[w])
    return result


def default_cap() -> int:
    """Per-chunk point count (REEF_DEVICE_MSM_CHUNK): 16384 measured
    fastest at the fold shapes (418k pts/s at 2^16 vs 290k at cap 8192 —
    fewer chunks = fewer per-chunk Fenwick/sort/accumulate costs); the
    one-time compile of the chunk body is ~6 min through the tunneled
    compile service and persistent-cached thereafter."""
    cap = int(os.environ.get("REEF_DEVICE_MSM_CHUNK", "16384"))
    return max(128, 1 << (cap - 1).bit_length())


def _use_fused() -> bool:
    import jax
    return jax.devices()[0].platform == "tpu"


class DeviceBasisV3:
    """Device-resident basis pre-shaped (n_chunks, 3, N, cap) for the
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
            # pad with zero-scalar GENERATORS, not identities: padding
            # lanes never enter a boundary prefix (digit 0 < every
            # bucket), and an all-Z=1 basis lets the fused tree kernel
            # gather only (X, Y) and use the 10-mul affine level-1 add
            gpad = ck.to_proj([ck.curve.gen])[0]
            pad = np.broadcast_to(gpad, (n2 - self.n, 3, limb.N))
            points = np.concatenate([points, pad])
        one = ck.lf.encode_host(1)
        self.all_z1 = bool(np.all(points[:, 2] == one))
        self.n2 = n2
        self.n_chunks = n2 // self.cap
        soa = np.transpose(points, (1, 2, 0))         # (3, N, n2)
        soa = soa.reshape(3, limb.N, self.n_chunks, self.cap)
        soa = np.ascontiguousarray(np.transpose(soa, (2, 0, 1, 3)))
        self.arr = jax.device_put(jnp.asarray(soa))
        self.ident_soa = jax.device_put(
            jnp.asarray(np.asarray(ck.ident)))        # (3, N)


@functools.lru_cache(maxsize=None)
def _rows_kernel_jit(ck: CurveKernels, cap: int, n_chunks: int,
                     use_fused: bool, tree_ok: bool, n_rows: int):
    """Multi-row MSM over a shared resident basis in ONE device program:
    lax.scan of the single-MSM kernel over the row axis, then the
    32-window combine (8 doublings + 1 add per window, MSB-first) on
    device — one dispatch + one (3,N,R) download for ALL rows, instead
    of R kernel launches + R host window-combines.  The Hyrax doc-commit
    rows (commitment.rs:171-198) route here for wide matrices."""
    import jax
    import jax.numpy as jnp

    single = _kernel_fn(ck, cap, n_chunks, use_fused, tree_ok)
    padd3 = _padd3(ck, use_fused)

    def fn(pts, scb_all, ident_soa):
        # pts (n_chunks,3,N,cap); scb_all (R, n_chunks, cap, 32)
        def body(_, s):
            return None, single(pts, s, ident_soa)

        _, accs = jax.lax.scan(body, None, scb_all)   # (R, 3, N, W)
        accs_w = jnp.transpose(accs, (3, 1, 2, 0))[::-1]  # (W,3,N,R) MSB 1st
        acc0 = jnp.broadcast_to(ident_soa[:, :, None],
                                (3, limb.N, n_rows))

        def comb(acc, aw):
            for _ in range(WINDOW_C):
                acc = padd3(acc, acc)
            return padd3(acc, aw), None

        out, _ = jax.lax.scan(comb, acc0, accs_w)
        return out                                    # (3, N, R)

    return jax.jit(fn)


def msm_device_v3_rows(ck: CurveKernels, rows_scalars,
                       points) -> List[Point]:
    """R independent MSMs of the SAME resident basis (the Hyrax row
    commits) in one device dispatch; returns R affine host points."""
    import jax.numpy as jnp

    if not isinstance(points, DeviceBasisV3):
        points = DeviceBasisV3(ck, points)
    R = len(rows_scalars)
    assert R >= 1
    scb = np.zeros((R, points.n2, 32), np.uint8)
    for r, row in enumerate(rows_scalars):
        assert len(row) <= points.n2
        scb[r, :len(row)] = scalars_to_bytes(list(row), ck.curve.order)

    kern = _rows_kernel_jit(ck, points.cap, points.n_chunks, _use_fused(),
                            getattr(points, "all_z1", True), R)
    from .msm import no_persistent_cache
    with no_persistent_cache():
        out = np.asarray(kern(
            points.arr,
            jnp.asarray(scb.reshape(R, points.n_chunks, points.cap, 32)),
            points.ident_soa))                        # (3, N, R)
    return ck.to_affine(np.transpose(out, (2, 0, 1)))


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

    kern = _kernel_jit(ck, points.cap, points.n_chunks, _use_fused(),
                       getattr(points, "all_z1", True))
    # no_persistent_cache: XLA:CPU cannot round-trip these big limb
    # executables (cache reads segfault); the tunneled TPU's remote
    # compiler ignores the local cache anyway
    from .msm import no_persistent_cache
    with no_persistent_cache():
        accs = np.asarray(kern(
            points.arr,
            jnp.asarray(scb.reshape(points.n_chunks, points.cap, 32)),
            points.ident_soa))
    return combine_windows(ck, accs)
