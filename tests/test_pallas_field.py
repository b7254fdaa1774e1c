"""Pallas Montgomery kernel vs the XLA limb path (interpret mode on CPU;
the compiled path is exercised on real TPU via bench.py / verify drives)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from reef_tpu.ops import limb
from reef_tpu.ops import pallas_field as PF

RNG = random.Random(17)


@pytest.mark.parametrize("lf", [limb.FQ, limb.FP], ids=["Fq", "Fp"])
def test_pallas_mul_matches_oracle(lf):
    B = 1024
    xs = [RNG.randrange(lf.p_int) for _ in range(B)]
    ys = [RNG.randrange(lf.p_int) for _ in range(B)]
    am = jnp.asarray(lf.encode(xs))
    bm = jnp.asarray(lf.encode(ys))
    out = PF.mont_mul(lf, am, bm, interpret=True)
    got = lf.decode(np.asarray(out))
    assert got == [(x * y) % lf.p_int for x, y in zip(xs, ys)]


def test_pallas_mul_padding():
    lf = limb.FQ
    B = 1100  # not a block multiple
    xs = [RNG.randrange(lf.p_int) for _ in range(B)]
    am = jnp.asarray(lf.encode(xs))
    out = PF.mont_mul(lf, am, am, interpret=True)
    got = lf.decode(np.asarray(out))
    assert got == [(x * x) % lf.p_int for x in xs]
