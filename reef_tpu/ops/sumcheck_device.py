"""Device-side nlookup sumcheck prover: eq-table build, FS chain, folds.

The per-batch hot loop of the prover (reference r1cs_helper.rs:441-506 runs
it in rug bignum on one core).  Here the entire round loop runs on device:

  - eq table: scatter the claim powers onto lookup rows + build the
    running-claim eq factors by iterative doubling (mul-vectorized);
  - each round: degree-2 coefficients via halving tree-sums of limb
    products, Poseidon sponge absorb/squeeze (the SAFE position schedule is
    static), fold both tables by the squeezed challenge;
  - the folded T table's final entry IS the next running claim T~(sc_rs).

The initial absorb phase (combined qs, lookup values, running claim) runs on
the host sponge — it's O(batch) tiny — and the sponge state transfers to
device Montgomery form.  One jit specialization per table length; reused
across every batch of a proof.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import limb, poseidon
from .limb import FQ, LimbField
from .poseidon import HostSponge


def _tree_sum(lf, arr):
    n = arr.shape[0]
    while n > 1:
        half = n // 2
        arr = limb.add(lf, arr[:half], arr[half:half * 2])
        n = half
    return arr[0]


def _one_round_kernel(lf: LimbField, t_tab, eq_tab, state):
    """ONE sumcheck round (state is the sponge at pos=1, squeezing).

    Jitted per table size: compiling all rounds fused inlines ell Poseidon
    scans into one graph, which the tunneled TPU compiler cannot digest;
    per-round graphs are permute-scan-sized and compile in seconds, cached
    across every round/batch/proof with the same shape."""
    half = t_tab.shape[0] // 2
    t0, t1 = t_tab[:half], t_tab[half:]
    e0, e1 = eq_tab[:half], eq_tab[half:]
    ts = limb.sub(lf, t1, t0)
    es = limb.sub(lf, e1, e0)
    xsq = _tree_sum(lf, limb.mul(lf, ts, es))
    x = _tree_sum(lf, limb.add(lf, limb.mul(lf, es, t0),
                               limb.mul(lf, ts, e0)))
    con = _tree_sum(lf, limb.mul(lf, t0, e0))
    # sponge absorb [con, x, xsq] at lanes 1..3 (squeeze->absorb resets pos
    # to 0 without permuting), then squeeze lane 1 after a permute
    state = state.at[1].set(limb.add(lf, state[1], con))
    state = state.at[2].set(limb.add(lf, state[2], x))
    state = state.at[3].set(limb.add(lf, state[3], xsq))
    state = poseidon.permute(lf, state, state.shape[0])
    r = state[1]
    rb = jnp.broadcast_to(r, t0.shape)
    t_fold = limb.add(lf, t0, limb.mul(lf, rb, ts))
    e_fold = limb.add(lf, e0, limb.mul(lf, rb, es))
    return t_fold, e_fold, jnp.stack([xsq, x, con]), r, state


@functools.lru_cache(maxsize=None)
def _round_jit(lf: LimbField):
    return jax.jit(functools.partial(_one_round_kernel, lf))


def _rounds_all(lf: LimbField, ell: int, t_tab, eq_tab, state):
    fn = _round_jit(lf)
    rs, gs = [], []
    for _ in range(ell):
        t_tab, eq_tab, g, r, state = fn(t_tab, eq_tab, state)
        rs.append(r)
        gs.append(g)
    return jnp.stack(rs), jnp.stack(gs), t_tab[0], state


def _build_eq_kernel(lf: LimbField, ell: int, qs_idx, rs_pow, run_pow,
                     prev_q):
    """eq table on device: scatter per-row claim sums + running-claim term.

    qs_idx: (m,) int32 DISTINCT rows; rs_pow: (m, N) pre-combined (host sums
    duplicate rows mod p, so scatter is a plain set — lane-wise uint32
    accumulation of Montgomery limbs would need carry handling);
    run_pow: (N,) = r^{m+1}; prev_q: (ell, N)."""
    n = 1 << ell
    eq = jnp.zeros((n, limb.N), jnp.uint32)
    eq = eq.at[qs_idx].set(rs_pow)
    # running-claim term: prod over bits of ~eq(bit_j(i), prev_q[j]) * r^{m+1}
    term = jnp.broadcast_to(run_pow, (1, limb.N))
    one = jnp.asarray(lf.one_mont)
    for j in range(ell):
        qj = prev_q[j]
        not_qj = limb.sub(lf, one, qj)
        lo = limb.mul(lf, term, jnp.broadcast_to(not_qj, term.shape))
        hi = limb.mul(lf, term, jnp.broadcast_to(qj, term.shape))
        term = jnp.stack([lo, hi], axis=1).reshape(-1, limb.N)
    return limb.add(lf, eq, term)


@functools.lru_cache(maxsize=None)
def _eq_jit(lf: LimbField, ell: int):
    return jax.jit(functools.partial(_build_eq_kernel, lf, ell))


class DeviceTableCache:
    """Montgomery-encoded device copy of a (constant) lookup table."""

    def __init__(self, lf: LimbField, table: List[int]):
        self.lf = lf
        self.ell = max(1, (len(table) - 1).bit_length())
        padded = [t % lf.p_int for t in table] + \
            [0] * ((1 << self.ell) - len(table))
        self.t_dev = jnp.asarray(lf.encode(padded))


def device_sumcheck_rounds(lf: LimbField, cache: DeviceTableCache,
                           qs: List[int], rs: List[int], prev_q: List[int],
                           sponge: HostSponge
                           ) -> Tuple[List[int], List[Tuple[int, int, int]],
                                      int]:
    """Run all rounds on device, syncing the host sponge afterwards.

    rs = [r^1..r^{m+1}] claim powers; returns (sc_rs, g_coeffs, next_v)."""
    ell = cache.ell
    # device sponge state from the host sponge (post-claim_r squeeze)
    assert sponge.squeezing and sponge.pos == 1
    state = jnp.asarray(lf.encode([s % lf.p_int for s in sponge.state]))
    # pre-combine duplicate lookup rows on host (mod p), pad to a fixed
    # width so jit specializations stay bounded
    p = lf.p_int
    combined = {}
    for i, q in enumerate(qs):
        combined[q] = (combined.get(q, 0) + rs[i]) % p
    idxs = sorted(combined)
    m_pad = len(qs)  # fixed per circuit: len(qs) is the batch lookup count
    vals = [combined[q] for q in idxs]
    # pad by repeating the last (index, value) pair — duplicate set() writes
    # of the same value are idempotent
    while len(idxs) < m_pad:
        idxs.append(idxs[-1])
        vals.append(vals[-1])
    qs_idx = jnp.asarray(np.array(idxs, np.int32))
    rs_dev = jnp.asarray(lf.encode(vals))
    run_dev = jnp.asarray(lf.encode(rs[len(qs)] % p))
    pq_dev = jnp.asarray(lf.encode([q % lf.p_int for q in prev_q]))

    eq_tab = _eq_jit(lf, ell)(qs_idx, rs_dev, run_dev, pq_dev)
    rs_out, gs_out, final_t, state_out = _rounds_all(
        lf, ell, cache.t_dev, eq_tab, state)

    sc_rs = lf.decode(np.asarray(rs_out))
    gs = lf.decode(np.asarray(gs_out).reshape(-1, limb.N))
    g_coeffs = [(gs[3 * i], gs[3 * i + 1], gs[3 * i + 2])
                for i in range(ell)]
    next_v = lf.decode(np.asarray(final_t))
    # resync host sponge: state after the last squeeze, pos=1, squeezing
    sponge.state = [v % lf.p_int for v in lf.decode(np.asarray(state_out))]
    sponge.pos = 1
    sponge.squeezing = True
    return sc_rs, g_coeffs, next_v
