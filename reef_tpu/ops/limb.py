"""Batched 255-bit field arithmetic on TPU as 16x16-bit limb vectors.

A field element is a little-endian vector of 16 uint32 lanes, each holding a
16-bit limb (shape `(..., 16)`); arbitrary leading batch dims vectorize over
the VPU.  Multiplication is Montgomery (R = 2^256): schoolbook partial
products split into lo/hi 16-bit halves accumulated into 32 columns (each
column stays < 2^23, far under the uint32 ceiling), followed by 16 unrolled
REDC rounds and a final carry-propagate + conditional subtract.

This mirrors the role of rug/GMP bignum in the reference
(/root/reference/src/backend/r1cs_helper.rs:441-506 does sumcheck math in
arbitrary-precision integers with `rem_floor(modulus)`), re-designed as a
fixed-shape, branch-free, batch-first kernel so XLA can fuse and tile it.
Everything on device stays in the Montgomery domain; encode/decode happens at
the host boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F

N = F.N_LIMBS          # 16 limbs
BITS = F.LIMB_BITS     # 16 bits per limb
MASK = np.uint32(F.LIMB_MASK)

u32 = jnp.uint32


class LimbField:
    """Device-side field context: modulus constants as numpy limb vectors.

    Instances are hashable static objects so jitted functions can close over
    them (all jnp constants are materialized lazily from numpy).
    """

    def __init__(self, host: F.HostField):
        self.host = host
        self.p_int = host.p
        self.p = np.array(F.to_limbs(host.p), dtype=np.uint32)
        self.r_int = host.R
        self.r2 = np.array(F.to_limbs(host.R2), dtype=np.uint32)
        self.one_mont = np.array(F.to_limbs(host.R), dtype=np.uint32)
        self.zero = np.zeros(N, dtype=np.uint32)
        self.n0inv = np.uint32(host.n0inv)
        # exponent bits of p-2 (MSB first) for Fermat inversion
        e = host.p - 2
        self.inv_bits = np.array(
            [(e >> i) & 1 for i in reversed(range(e.bit_length()))],
            dtype=np.uint32,
        )

    def __repr__(self):
        return f"LimbField({self.host.name})"

    # ---- host <-> device conversion (canonical domain) ----

    def to_arr(self, xs) -> np.ndarray:
        """Python int(s) -> canonical limb array (no Montgomery encoding)."""
        if isinstance(xs, int):
            return np.array(F.to_limbs(xs % self.p_int), dtype=np.uint32)
        flat = [F.to_limbs(int(x) % self.p_int) for x in np.ravel(np.array(xs, dtype=object))]
        out = np.array(flat, dtype=np.uint32)
        return out.reshape(tuple(np.shape(xs)) + (N,))

    def to_int(self, arr) -> object:
        """Canonical limb array -> python int (or nested list of ints)."""
        arr = np.asarray(arr)
        if arr.ndim == 1:
            return F.from_limbs(arr)
        return [self.to_int(a) for a in arr]

    def encode_host(self, xs) -> np.ndarray:
        """Montgomery-encode via pure python ints (no jax; safe under trace).

        Use for constants materialized inside traced functions; `encode` is
        faster for large host batches but must not run during tracing.
        """
        if isinstance(xs, int):
            return np.array(F.to_limbs((xs * self.r_int) % self.p_int), np.uint32)
        flat = [F.to_limbs((int(x) * self.r_int) % self.p_int)
                for x in np.ravel(np.array(xs, dtype=object))]
        return np.array(flat, np.uint32).reshape(tuple(np.shape(xs)) + (N,))

    # Montgomery-domain convenience wrappers (host side).  Batches are padded
    # to a multiple of 64 so jit specializes on few shapes (eager-mode
    # per-op dispatch is ruinously slow for limb kernels).
    def encode(self, xs):
        if isinstance(xs, int):
            return np.asarray(to_mont_jit(self, jnp.asarray(self.to_arr(xs))))
        arr = self.to_arr(xs)
        flat = arr.reshape(-1, N)
        n = flat.shape[0]
        npad = -n % 64
        if npad:
            flat = np.concatenate([flat, np.zeros((npad, N), np.uint32)])
        out = np.asarray(to_mont_jit(self, jnp.asarray(flat)))[:n]
        return out.reshape(arr.shape)

    def decode(self, arr):
        arr = np.asarray(arr)
        single = arr.ndim == 1
        flat = arr.reshape(-1, N)
        n = flat.shape[0]
        npad = -n % 64
        if npad:
            flat = np.concatenate([flat, np.zeros((npad, N), np.uint32)])
        out = np.asarray(from_mont_jit(self, jnp.asarray(flat)))[:n]
        ints = [F.from_limbs(row) for row in out]
        if single:
            return ints[0]
        if arr.ndim == 2:
            return ints
        return np.array(ints, dtype=object).reshape(arr.shape[:-1]).tolist()


FP = LimbField(F.FP)
FQ = LimbField(F.FQ)


# ---------------------------------------------------------------------------
# raw limb helpers (no modulus)
# ---------------------------------------------------------------------------

def raw_add(a, b):
    """(a + b) mod 2^256 with carry chain; returns (sum_limbs, carry_out)."""
    out = []
    c = jnp.zeros(a.shape[:-1], u32)
    for k in range(N):
        t = a[..., k] + b[..., k] + c
        out.append(t & MASK)
        c = t >> BITS
    return jnp.stack(out, axis=-1), c


def raw_sub(a, b):
    """(a - b) mod 2^256 with borrow chain; returns (diff_limbs, borrow_out)."""
    out = []
    brw = jnp.zeros(a.shape[:-1], u32)
    for k in range(N):
        t = a[..., k] + u32(1 << BITS) - b[..., k] - brw
        out.append(t & MASK)
        brw = u32(1) - (t >> BITS)
    return jnp.stack(out, axis=-1), brw


def geq(a, b):
    """a >= b for canonical limb vectors; returns bool array over batch."""
    res = jnp.zeros(a.shape[:-1], bool)
    eq = jnp.ones(a.shape[:-1], bool)
    for k in reversed(range(N)):
        res = res | (eq & (a[..., k] > b[..., k]))
        eq = eq & (a[..., k] == b[..., k])
    return res | eq


def select(mask, a, b):
    """Elementwise limb select: mask ? a : b (mask over batch dims)."""
    return jnp.where(mask[..., None], a, b)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq_limbs(a, b):
    return jnp.all(a == b, axis=-1)


# ---------------------------------------------------------------------------
# modular ops (operands canonical-or-Montgomery; both stay < p)
# ---------------------------------------------------------------------------

def _cond_sub_p(f: LimbField, a):
    p = jnp.asarray(f.p)
    d, _ = raw_sub(a, jnp.broadcast_to(p, a.shape))
    return select(geq(a, jnp.broadcast_to(p, a.shape)), d, a)


def add(f: LimbField, a, b):
    s, _ = raw_add(a, b)          # a,b < p < 2^255 so no carry out of 2^256
    return _cond_sub_p(f, s)


def sub(f: LimbField, a, b):
    d, brw = raw_sub(a, b)
    dp, _ = raw_add(d, jnp.broadcast_to(jnp.asarray(f.p), d.shape))
    return select(brw.astype(bool), dp, d)


def neg(f: LimbField, a):
    return sub(f, jnp.zeros_like(a), a)


# antidiagonal selection tensors: SEL[i,j,k] = [i+j == k], shifted variant
# for the high halves.  One einsum contraction replaces 32 sequential
# dynamic-update-slice accumulations — XLA (especially the CPU backend)
# compiles the einsum form over an order of magnitude faster.
_SEL_LO = np.zeros((N, N, 2 * N), np.uint32)
_SEL_HI = np.zeros((N, N, 2 * N), np.uint32)
for _i in range(N):
    for _j in range(N):
        _SEL_LO[_i, _j, _i + _j] = 1
        _SEL_HI[_i, _j, _i + _j + 1] = 1


def mul(f: LimbField, a, b):
    """Montgomery product: a * b * R^-1 mod p, batched over leading dims.

    Inputs/outputs are < p.  If both inputs are Montgomery-encoded the result
    is too, which is how all chained device math runs.
    """
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch + (N,))
    b = jnp.broadcast_to(b, batch + (N,))

    # partial products: P[..., i, j] = a_i * b_j (exact in uint32: 16b x 16b)
    pp = a[..., :, None] * b[..., None, :]
    lo = pp & MASK
    hi = pp >> BITS

    # column sums over antidiagonals (each < 32 * 2^16 < 2^21)
    cols = (jnp.einsum("...ij,ijk->...k", lo, jnp.asarray(_SEL_LO))
            + jnp.einsum("...ij,ijk->...k", hi, jnp.asarray(_SEL_HI)))
    return redc_cols(f, cols)


def redc_cols(f: LimbField, cols):
    """Montgomery-reduce a (..., 32)-column accumulation (columns < ~2^26)
    to a canonical (..., 16) element.  Shared by `mul` and the MXU Poseidon
    path, which produces such columns from int8 matmuls."""
    batch = cols.shape[:-1]
    p_limbs = jnp.asarray(f.p)
    for i in range(N):
        m = (cols[..., i] * f.n0inv) & MASK
        mp = m[..., None] * p_limbs
        cols = cols.at[..., i : i + N].add(mp & MASK)
        cols = cols.at[..., i + 1 : i + N + 1].add(mp >> BITS)
        cols = cols.at[..., i + 1].add(cols[..., i] >> BITS)

    # result = cols[16:32], carry-propagated; < 2p so one conditional subtract
    out = []
    c = jnp.zeros(batch, u32)
    for k in range(N, 2 * N):
        t = cols[..., k] + c
        out.append(t & MASK)
        c = t >> BITS
    r = jnp.stack(out, axis=-1)
    # MXU accumulations can reach T ~ 5p^2 > R*p, so t < ~2.3p: two
    # conditional subtracts cover it (the plain-mul path needs only one)
    return _cond_sub_p(f, _cond_sub_p(f, r))


def sqr(f: LimbField, a):
    return mul(f, a, a)


def to_mont(f: LimbField, a):
    return mul(f, a, jnp.asarray(f.r2))


def from_mont(f: LimbField, a):
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mul(f, a, one)


def pow5(f: LimbField, a):
    """a^5 (2 squarings + 1 mul) — the Poseidon S-box exponent."""
    a2 = mul(f, a, a)
    a4 = mul(f, a2, a2)
    return mul(f, a4, a)


def _pow_bits(f: LimbField, a, bits: np.ndarray):
    """a^e for a static MSB-first bit array e, via lax.scan (Montgomery in/out)."""
    one = jnp.broadcast_to(jnp.asarray(f.one_mont), a.shape)

    def body(r, bit):
        r = mul(f, r, r)
        r = select(bit.astype(bool) & jnp.ones(r.shape[:-1], bool), mul(f, r, a), r)
        return r, None

    r, _ = jax.lax.scan(body, one, jnp.asarray(bits))
    return r


def inv(f: LimbField, a):
    """a^-1 via Fermat (a^(p-2)); Montgomery in/out. inv(0) returns 0-ish garbage
    (p-2 power of 0 is 0), matching the convention that callers never invert 0."""
    return _pow_bits(f, a, f.inv_bits)


# jitted conveniences keyed by field (static arg).  Inside larger kernels use
# the raw traceable functions; at the host boundary use these.
mul_jit = jax.jit(mul, static_argnums=0)
add_jit = jax.jit(add, static_argnums=0)
sub_jit = jax.jit(sub, static_argnums=0)
neg_jit = jax.jit(neg, static_argnums=0)
inv_jit = jax.jit(inv, static_argnums=0)
pow5_jit = jax.jit(pow5, static_argnums=0)
to_mont_jit = jax.jit(to_mont, static_argnums=0)
from_mont_jit = jax.jit(from_mont, static_argnums=0)
