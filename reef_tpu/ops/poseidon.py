"""Batched Poseidon permutation on TPU + SAFE sponge (host + traced flavors).

Role in the system (mirrors neptune 8.1 in the reference):
  - prover-side Fiat-Shamir sponge for the nlookup sumcheck
    (/root/reference/src/backend/r1cs.rs:2260-2310),
  - Merkle tree hashing (/root/reference/src/backend/merkle_tree.rs:25-104),
  - in-circuit sponge replay (/root/reference/src/backend/nova.rs:549-681) —
    the circuit gadget in reef_tpu.backend.gadgets mirrors THIS module's
    absorb/squeeze semantics, which is what makes proofs verify,
  - Nova's random oracle.

The device permutation runs one `lax.scan` over all R_F + R_P rounds with a
per-round full/partial mask, every field op batched over leading dims via the
limb kernels.  Width t = 5 (arity 4) is the workhorse, matching
`Sponge::api_constants` arity in the reference (framework.rs:70-74).
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import limb
from .limb import LimbField
from .poseidon_constants import (FULL_ROUNDS, PARTIAL_ROUNDS, host_permutation,
                                 poseidon_params)


@functools.lru_cache(maxsize=None)
def _device_consts(lf: LimbField, t: int):
    """Round constants (n_rounds, t, N) and MDS (t, t, N), Montgomery-encoded."""
    rc, mds = poseidon_params(lf.p_int, t)
    n_rounds = FULL_ROUNDS + PARTIAL_ROUNDS[t]
    rc_arr = lf.encode_host(list(rc)).reshape(n_rounds, t, limb.N)
    mds_arr = lf.encode_host([mds[i][j] for i in range(t) for j in range(t)])
    mds_arr = mds_arr.reshape(t, t, limb.N)
    half = FULL_ROUNDS // 2
    is_full = np.zeros(n_rounds, dtype=bool)
    is_full[:half] = True
    is_full[n_rounds - half:] = True
    return rc_arr, mds_arr, is_full


def permute(lf: LimbField, state, t: int | None = None):
    """Poseidon permutation, batched: state (..., t, N_LIMBS) Montgomery."""
    if t is None:
        t = state.shape[-2]
    rc, mds, is_full = _device_consts(lf, t)
    rc = jnp.asarray(rc)
    mds = jnp.asarray(mds)
    is_full = jnp.asarray(is_full)

    def round_fn(s, inputs):
        rc_r, full = inputs
        # add round constants
        s = limb.add(lf, s, rc_r)
        # S-box: lane 0 always; other lanes only in full rounds
        s5 = limb.pow5(lf, s)
        lane0 = jnp.zeros(s.shape[:-1], bool).at[..., 0].set(True)
        keep = lane0 | jnp.broadcast_to(full, s.shape[:-1])
        s = limb.select(keep, s5, s)
        # MDS mix: out_i = sum_j mds[i][j] * s_j
        prod = limb.mul(lf, s[..., None, :, :], mds)          # (..., t, t, N)
        acc = prod[..., 0, :]
        for j in range(1, t):
            acc = limb.add(lf, acc, prod[..., j, :])
        return acc, None

    state, _ = jax.lax.scan(round_fn, state, (rc, is_full))
    return state


permute_jit = jax.jit(permute, static_argnums=(0, 2))


def hash_elems(lf: LimbField, elems_mont, t: int = 5):
    """One-shot batched hash of (..., t-1, N) Montgomery elems -> (..., N).

    Fixed-length absorb of t-1 elements with a SAFE-style domain tag in the
    capacity lane, one permutation, squeeze lane 1.  Used for Merkle nodes
    and other fixed-arity hashing.
    """
    batch = elems_mont.shape[:-2]
    io = IOPattern([("absorb", t - 1), ("squeeze", 1)])
    tag = jnp.asarray(tag_elem(lf, io))
    state = jnp.concatenate(
        [jnp.broadcast_to(tag, batch + (1, limb.N)), elems_mont], axis=-2
    )
    out = permute(lf, state, t)
    return out[..., 1, :]


# ---------------------------------------------------------------------------
# SAFE IOPattern + sponge
# ---------------------------------------------------------------------------

class IOPattern:
    """SAFE-style IO pattern: list of ("absorb"|"squeeze", n) ops.

    The tag hashes the aggregated pattern (consecutive same-type ops merged)
    plus a domain separator; it initializes the capacity lane, binding the
    transcript shape — the same role as neptune's IOPattern
    (used by the reference at r1cs.rs:2263-2277 with mode-dependent patterns).
    """

    def __init__(self, ops, domain: bytes = b""):
        agg = []
        for kind, n in ops:
            assert kind in ("absorb", "squeeze") and n > 0
            if agg and agg[-1][0] == kind:
                agg[-1] = (kind, agg[-1][1] + n)
            else:
                agg.append((kind, n))
        self.ops = agg
        self.domain = domain

    def words(self):
        out = []
        for kind, n in self.ops:
            out.append((0x80000000 | n) if kind == "absorb" else n)
        return out

    def tag_int(self) -> int:
        h = hashlib.sha256()
        for w in self.words():
            h.update(w.to_bytes(4, "big"))
        h.update(self.domain)
        return int.from_bytes(h.digest()[:16], "big")


@functools.lru_cache(maxsize=None)
def _tag_cache(lf: LimbField, tag_int: int):
    return lf.encode_host(tag_int % lf.p_int)


def tag_elem(lf: LimbField, io: IOPattern):
    """Montgomery-encoded field element for the pattern tag (cached)."""
    return _tag_cache(lf, io.tag_int())


class HostSponge:
    """SAFE duplex sponge over python ints (host-side Fiat-Shamir).

    Semantics (mirrored exactly by the in-circuit gadget):
      state[0] = tag; absorb adds into state[1+pos]; squeeze reads
      state[1+pos]; a permutation fires when the rate (t-1) is exhausted or
      on an absorb->squeeze direction change.
    """

    RATE = 4
    T = 5

    def __init__(self, field: F.HostField, io: IOPattern,
                 rate: int = None):
        self.f = field
        self.io = io
        if rate is not None:
            self.RATE = rate            # instance override (t = rate + 1)
        self.state = [io.tag_int() % field.p] + [0] * self.RATE
        self.pos = 0
        self.squeezing = False

    def _permute(self):
        self.state = host_permutation(self.f.p, self.state)
        self.pos = 0

    def absorb(self, elems):
        if self.squeezing:
            # squeeze->absorb direction change: reset position, NO permute
            # (SAFE semantics; keeps one permutation per sumcheck round,
            # matching the reference's 288-constraints-per-sponge cost shape,
            # costs.rs:115-138)
            self.pos = 0
            self.squeezing = False
        for e in elems:
            if self.pos == self.RATE:
                self._permute()
            self.state[1 + self.pos] = (self.state[1 + self.pos] + e) % self.f.p
            self.pos += 1

    def squeeze(self, n: int) -> list[int]:
        if not self.squeezing:
            self._permute()
            self.squeezing = True
        out = []
        for _ in range(n):
            if self.pos == self.RATE:
                self._permute()
            out.append(self.state[1 + self.pos])
            self.pos += 1
        return out
