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


def test_pallas_redc_cols_matches_xla():
    """mont_redc_cols vs limb.redc_cols on MXU-shaped column inputs."""
    import numpy as np
    import jax.numpy as jnp
    import random
    from reef_tpu.ops import limb

    lf = limb.FQ
    rng = random.Random(9)
    B = 256
    cols = np.zeros((B, 2 * limb.N), np.uint32)
    for i in range(B):
        # column magnitudes the MXU matmul actually produces (< 2^31)
        cols[i] = [rng.randrange(1 << 31) for _ in range(2 * limb.N)]
    want = np.asarray(limb.redc_cols(lf, jnp.asarray(cols)))
    got = np.asarray(PF.mont_redc_cols(lf, jnp.asarray(cols),
                                       interpret=True))
    assert (got == want).all()
