"""Batched EC point ops + MSM on TPU over the limb kernels.

Points are projective (X:Y:Z) triples of Montgomery limb vectors, shape
(..., 3, N_LIMBS); identity = (0:1:0).  Addition uses the COMPLETE formulas
for short-Weierstrass a=0 (Renes-Costello-Batina 2016, Algorithm 7) so the
kernel is branch-free and vectorizes over arbitrary batches — the TPU-native
replacement for the reference's pasta_curves/nova Pedersen MSM path
(commitment.rs:182-187, nova folding commitments).

The first-cut MSM is a masked binary reduction: for each scalar bit (MSB
first) double the accumulator and add the tree-reduced sum of selected
points; ~255*n vectorized point-adds.  (A bucketed Pippenger with sorted
segments is the planned upgrade; this version is simple, correct, and fully
on-device.)
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import field as F
from ..ops import limb
from ..ops.limb import LimbField
from .pasta import Curve, Point


import contextlib


@contextlib.contextmanager
def no_persistent_cache():
    """Bypass jax's persistent compile cache around the big limb-op MSM
    kernels: XLA:CPU's executable (de)serialization is broken for them —
    cache writes can abort the process (C++ CHECK in executable.serialize)
    and reads of successfully written entries segfault in the AOT loader
    (observed for both the single-device window kernels and the SPMD
    sharded kernels on jax 0.9).  They recompile per process instead;
    the Poseidon / sumcheck executables round-trip fine and stay cached.

    jax 0.9 caches the enabled/used decision in module-level singletons
    (`compilation_cache._cache` / `_cache_used`, re-evaluated at most once
    — see `_get_cache` / `is_cache_used`), so merely flipping the config
    after ANY earlier compile is a no-op and writes still reach the broken
    serializer (the round-3 segfault).  The effective sequence is: flip
    `jax_enable_compilation_cache` AND call `reset_cache()` so the next
    compile re-evaluates the gate; on exit flip back and reset again so
    the cache lazily re-initializes for the kernels that round-trip fine.

    Escape hatch: REEF_MSM_CACHE=1 makes this a no-op, i.e. the MSM
    executables cache normally.  The CPU test/dryrun environments set it
    (conftest.py, __graft_entry__): write+read round-trips were probed
    clean there on jax 0.9 / XLA:CPU, and warm committed entries turn the
    minutes-long SPMD recompiles into sub-second cache loads.  The
    tunneled-TPU production path keeps the bypass (default)."""
    import os
    if os.environ.get("REEF_MSM_CACHE", "0") == "1":
        yield
        return
    try:
        from jax._src import compilation_cache as _cc
        _reset = _cc.reset_cache
    except Exception:  # future-jax fallback: config flip only
        def _reset():
            return None
    prev = jax.config.jax_enable_compilation_cache
    try:
        jax.config.update("jax_enable_compilation_cache", False)
        _reset()
        yield
    finally:
        jax.config.update("jax_enable_compilation_cache", prev)
        _reset()


class CurveKernels:
    """Device context for one curve (base-field limb ops + constants)."""

    def __init__(self, curve: Curve, lf: LimbField):
        assert curve.p == lf.p_int
        self.curve = curve
        self.lf = lf
        self.b3 = lf.encode_host(15)              # 3*b, Montgomery
        self.ident = np.zeros((3, limb.N), np.uint32)
        self.ident[1] = lf.encode_host(1)         # (0 : 1 : 0)

    # ---- host <-> device -----------------------------------------------

    def to_proj(self, pts: List[Point]) -> np.ndarray:
        """Affine host points -> (n, 3, N) Montgomery projective array."""
        out = np.zeros((len(pts), 3, limb.N), np.uint32)
        one = self.lf.encode_host(1)
        for i, pt in enumerate(pts):
            if pt is None:
                out[i] = self.ident
            else:
                out[i, 0] = self.lf.encode_host(pt[0])
                out[i, 1] = self.lf.encode_host(pt[1])
                out[i, 2] = one
        return out

    def to_affine(self, proj) -> List[Point]:
        """Device projective array -> affine host points."""
        arr = np.asarray(proj)
        single = arr.ndim == 2
        if single:
            arr = arr[None]
        p = self.curve.p
        # ONE batched Montgomery decode for all coordinates (a per-row
        # decode costs 3 device round trips per point — seconds over the
        # tunneled TPU)
        coords = self.lf.decode(arr.reshape(-1, 3, limb.N))
        out = []
        for x, y, z in coords:
            if z == 0:
                out.append(None)
            else:
                zi = pow(z, p - 2, p)
                out.append((x * zi % p, y * zi % p))
        return out[0] if single else out


def padd(ck: CurveKernels, P, Q):
    """Complete projective addition, batched over leading dims.

    P, Q: (..., 3, N) Montgomery limbs.  Handles identity and doubling."""
    f = ck.lf
    mul = lambda a, b: limb.mul(f, a, b)
    add = lambda a, b: limb.add(f, a, b)
    sub = lambda a, b: limb.sub(f, a, b)
    b3 = jnp.asarray(ck.b3)

    X1, Y1, Z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
    X2, Y2, Z2 = Q[..., 0, :], Q[..., 1, :], Q[..., 2, :]

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
    t2 = mul(b3, t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mul(b3, Y3)
    X3 = mul(t4, Y3)
    X3 = sub(mul(t3, t1), X3)
    Y3 = mul(Y3, t0)
    Y3 = add(mul(t1, Z3), Y3)
    t0 = mul(t0, t3)
    Z3 = add(mul(Z3, t4), t0)
    return jnp.stack([X3, Y3, Z3], axis=-2)


def pdouble(ck: CurveKernels, P):
    return padd(ck, P, P)


def select_point(mask, P, Q):
    """mask (...,) bool: P where mask else Q (broadcast over (3, N))."""
    return jnp.where(mask[..., None, None], P, Q)


def tree_reduce(ck: CurveKernels, pts):
    """(n, 3, N) -> (3, N) sum via halving vector adds (n power of 2)."""
    n = pts.shape[0]
    while n > 1:
        half = n // 2
        pts = padd(ck, pts[:half], pts[half:half * 2])
        n = half
    return pts[0]


def _msm_kernel(ck: CurveKernels, bits, pts, ident):
    """bits: (nbits, n) uint32; pts: (n, 3, N). Returns (3, N)."""
    def body(acc, bits_row):
        acc = pdouble(ck, acc)
        sel = select_point(bits_row.astype(bool), pts,
                           jnp.broadcast_to(ident, pts.shape))
        acc = padd(ck, acc, tree_reduce(ck, sel))
        return acc, None

    acc, _ = jax.lax.scan(body, ident, bits)
    return acc


@functools.lru_cache(maxsize=None)
def _msm_jit(ck: CurveKernels):
    return jax.jit(lambda bits, pts, ident: _msm_kernel(ck, bits, pts, ident))


def msm_device(ck: CurveKernels, scalars: List[int], points) -> np.ndarray:
    """MSM on device: scalars (host ints) x points ((n,3,N) or host list)."""
    if isinstance(points, list):
        points = ck.to_proj(points)
    n = len(scalars)
    assert points.shape[0] == n
    # pad to a power of two with identities
    n2 = 1 << max(0, (n - 1)).bit_length() if n > 1 else 1
    if n2 != n:
        pad = np.broadcast_to(ck.ident, (n2 - n, 3, limb.N))
        points = jnp.concatenate([jnp.asarray(points), jnp.asarray(pad)])
        scalars = list(scalars) + [0] * (n2 - n)
    nbits = ck.curve.order.bit_length()
    bits = np.zeros((nbits, n2), np.uint32)
    for i, s in enumerate(scalars):
        s %= ck.curve.order
        for j in range(nbits):
            bits[j, i] = (s >> (nbits - 1 - j)) & 1
    out = _msm_jit(ck)(jnp.asarray(bits), jnp.asarray(points),
                       jnp.asarray(ck.ident))
    return np.asarray(out)


PALLAS_K = None
VESTA_K = None


def pallas_kernels() -> CurveKernels:
    global PALLAS_K
    if PALLAS_K is None:
        from .pasta import PALLAS
        PALLAS_K = CurveKernels(PALLAS, limb.FP)
    return PALLAS_K


def vesta_kernels() -> CurveKernels:
    global VESTA_K
    if VESTA_K is None:
        from .pasta import VESTA
        VESTA_K = CurveKernels(VESTA, limb.FQ)
    return VESTA_K
