"""Device (jax) side of the Poseidon permutation — see poseidon.py.

Split from poseidon.py so host-only consumers (the CLI prove/verify path,
which does all its Fiat-Shamir through HostSponge) never pay the jax import
(~2.6 s/process via the platform plugin).  `reef_tpu.ops.poseidon` forwards
these names lazily, so callers keep using `poseidon.permute(...)` etc.

The device permutation runs one `lax.scan` over all R_F + R_P rounds with a
per-round full/partial mask, every field op batched over leading dims via the
limb kernels.  Width t = 5 (arity 4) is the workhorse, matching
`Sponge::api_constants` arity in the reference (framework.rs:70-74).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limb
from .limb import LimbField
from .poseidon import IOPattern
from .poseidon_constants import FULL_ROUNDS, PARTIAL_ROUNDS, poseidon_params


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
    """Poseidon permutation, batched: state (..., t, N_LIMBS) Montgomery.

    On TPU with batches >= one pallas block (1024), dispatches to the
    fully-fused VMEM-resident kernel (ops/poseidon_pallas.py: all rounds
    on-chip, limbs-major S-boxes, MXU MDS) — measured ~5x this scan
    formulation and bit-identical.  Small batches (the per-fold FS
    sponges) keep the scan: block padding would waste >90% of the lanes.
    """
    if t is None:
        t = state.shape[-2]
    import numpy as _np
    B = int(_np.prod(state.shape[:-2])) if state.shape[:-2] else 1
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu and B >= 1024 and t in PARTIAL_ROUNDS:
        from . import poseidon_pallas
        return poseidon_pallas.permute(lf, state, t)
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


@functools.lru_cache(maxsize=None)
def _tag_cache(lf: LimbField, tag_int: int):
    return lf.encode_host(tag_int % lf.p_int)


def tag_elem(lf: LimbField, io: IOPattern):
    """Montgomery-encoded field element for the pattern tag (cached)."""
    return _tag_cache(lf, io.tag_int())
