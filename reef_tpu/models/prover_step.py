"""The flagship device step: fused batched Poseidon + sumcheck fold round.

This is the prover's per-round device workload (SURVEY.md section 5's
long-document scaling path): a batch of Poseidon permutations (Fiat-Shamir /
Merkle hashing) fused with one MLE-product sumcheck round over the T/eq
tables — compute degree-2 coefficients (tree-reduced sums of limb products)
and fold both tables by the challenge.

Tables are stored split-halved as (2, half, N_LIMBS) so the round's
top-bit split is the leading axis and the `half` axis shards cleanly over a
device mesh (reef_tpu.parallel.mesh adds the collectives).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops import limb, poseidon
from ..ops.limb import FQ


def _tree_sum(lf, arr):
    """(n, N) -> (N,) modular sum via halving adds (n power of two)."""
    n = arr.shape[0]
    while n > 1:
        half = n // 2
        arr = limb.add(lf, arr[:half], arr[half:half * 2])
        n = half
    return arr[0]


def sumcheck_round(lf, t_tab, eq_tab, r):
    """One linear_mle_product round on device (r1cs_helper.rs:441-506).

    t_tab, eq_tab: (2, half, N) Montgomery; r: (N,) Montgomery challenge.
    Returns folded (half, N) tables + (xsq, x, con) coefficient limbs."""
    t0, t1 = t_tab[0], t_tab[1]
    e0, e1 = eq_tab[0], eq_tab[1]
    ts = limb.sub(lf, t1, t0)
    es = limb.sub(lf, e1, e0)
    xsq = _tree_sum(lf, limb.mul(lf, ts, es))
    x = _tree_sum(lf, limb.add(lf, limb.mul(lf, es, t0),
                               limb.mul(lf, ts, e0)))
    con = _tree_sum(lf, limb.mul(lf, t0, e0))
    rb = jnp.broadcast_to(r, t0.shape)
    t_fold = limb.add(lf, t0, limb.mul(lf, rb, ts))
    e_fold = limb.add(lf, e0, limb.mul(lf, rb, es))
    return t_fold, e_fold, xsq, x, con


def device_step(states, t_tab, eq_tab, r):
    """Jittable single-chip flagship step.

    states: (B, 5, N) Poseidon states; t_tab/eq_tab: (2, half, N); r: (N,)."""
    lf = FQ
    states = poseidon.permute(lf, states, 5)
    t_fold, e_fold, xsq, x, con = sumcheck_round(lf, t_tab, eq_tab, r)
    return states, t_fold, e_fold, xsq, x, con


def example_args(batch: int = 256, half: int = 128):
    import numpy as np
    lf = FQ
    rng = np.random.default_rng(0)

    def rand(n):
        vals = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
        return lf.encode_host(vals)

    states = jnp.asarray(rand(batch * 5).reshape(batch, 5, limb.N))
    t_tab = jnp.asarray(rand(2 * half).reshape(2, half, limb.N))
    eq_tab = jnp.asarray(rand(2 * half).reshape(2, half, limb.N))
    r = jnp.asarray(lf.encode_host(12345))
    return states, t_tab, eq_tab, r
