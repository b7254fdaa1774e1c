"""MXU-formulated Poseidon must be bit-identical to the vanilla path."""

import random

import jax.numpy as jnp
import numpy as np

from reef_tpu.ops import limb, poseidon, poseidon_mxu
from reef_tpu.ops.poseidon_constants import host_permutation

RNG = random.Random(23)


def test_mxu_permutation_matches_host():
    lf = limb.FQ
    batch, t = 8, 5
    states = [[RNG.randrange(lf.p_int) for _ in range(t)]
              for _ in range(batch)]
    flat = [x for s in states for x in s]
    dev = jnp.asarray(lf.encode(flat)).reshape(batch, t, limb.N)
    out = poseidon_mxu.permute_jit(lf, dev, t)
    got = lf.decode(np.asarray(out).reshape(batch * t, limb.N))
    want = [x for s in states for x in host_permutation(lf.p_int, s)]
    assert got == want
