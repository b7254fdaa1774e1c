"""Pallas EC: tile-level complete-add math + MSM orchestration (CPU).

The compiled kernel itself is TPU-validated in verify drives (Mosaic
interpret mode is intractably slow for a kernel this size on CPU)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from reef_tpu.ec import msm as M
from reef_tpu.ec import pallas_ec as PE
from reef_tpu.ec.pasta import VESTA
from reef_tpu.ops.limb import N

RNG = random.Random(5)
ck = M.vesta_kernels()
cv = VESTA


def eager_padd(P, Q):
    """padd on SoA arrays via the pure tile function (no pallas, no jit)."""
    Xs = lambda A, c: [A[c, i] for i in range(N)]
    X3, Y3, Z3 = PE.padd_tiles(ck, Xs(P, 0), Xs(P, 1), Xs(P, 2),
                               Xs(Q, 0), Xs(Q, 1), Xs(Q, 2))
    return jnp.stack([jnp.stack(X3), jnp.stack(Y3), jnp.stack(Z3)])


def test_padd_tiles_complete_cases():
    pairs = [(cv.mul(RNG.randrange(1, 10**6), cv.gen),
              cv.mul(RNG.randrange(1, 10**6), cv.gen)) for _ in range(3)]
    g5 = cv.mul(5, cv.gen)
    pairs += [(None, cv.gen), (g5, g5), (g5, cv.neg(g5)), (None, None),
              (cv.gen, None)]
    P = PE.aos_to_soa(jnp.asarray(ck.to_proj([a for a, _ in pairs])))
    Q = PE.aos_to_soa(jnp.asarray(ck.to_proj([b for _, b in pairs])))
    out = eager_padd(P, Q)
    got = ck.to_affine(np.asarray(PE.soa_to_aos(out)))
    assert got == [cv.add(a, b) for a, b in pairs]


@pytest.mark.slow
def test_msm_pallas_orchestration(monkeypatch):
    monkeypatch.setattr(PE, "BLOCK", 4)
    n = 6
    pts = [cv.mul(RNG.randrange(1, 10**6), cv.gen) for _ in range(n)]
    scalars = [RNG.randrange(200) for _ in range(n)]
    out = PE.msm_pallas(ck, scalars, pts, _padd_override=eager_padd)
    got = ck.to_affine(np.asarray(out))
    assert got == cv._msm_py(scalars, pts)
