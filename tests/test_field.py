"""Limb-kernel field arithmetic vs the python-int host oracle.

Mirrors the reference's practice of checking field kernels against bignum
(/root/reference/src/backend/r1cs_helper.rs:472-503 keeps sumcheck math in rug
Integers reduced mod the field).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from reef_tpu.ops import field as F
from reef_tpu.ops import limb

RNG = random.Random(0xC0FFEE)


def rand_elems(f, n):
    return [RNG.randrange(f.p_int) for _ in range(n)]


@pytest.mark.parametrize("lf", [limb.FP, limb.FQ], ids=["Fp", "Fq"])
class TestLimbField:
    def test_roundtrip(self, lf):
        xs = rand_elems(lf, 8) + [0, 1, lf.p_int - 1]
        arr = lf.to_arr(xs)
        assert lf.to_int(arr) == xs

    def test_mont_encode_decode(self, lf):
        xs = rand_elems(lf, 8)
        assert lf.decode(lf.encode(xs)) == xs

    def test_add_sub_neg(self, lf):
        xs = rand_elems(lf, 16)
        ys = rand_elems(lf, 16)
        a, b = jnp.asarray(lf.to_arr(xs)), jnp.asarray(lf.to_arr(ys))
        host = lf.host
        assert lf.to_int(limb.add_jit(lf, a, b)) == [host.add(x, y) for x, y in zip(xs, ys)]
        assert lf.to_int(limb.sub_jit(lf, a, b)) == [host.sub(x, y) for x, y in zip(xs, ys)]
        assert lf.to_int(limb.neg_jit(lf, a)) == [host.neg(x) for x in xs]

    def test_add_edge_cases(self, lf):
        xs = [lf.p_int - 1, lf.p_int - 1, 0, 1]
        ys = [1, lf.p_int - 1, 0, lf.p_int - 1]
        a, b = jnp.asarray(lf.to_arr(xs)), jnp.asarray(lf.to_arr(ys))
        assert lf.to_int(limb.add_jit(lf, a, b)) == [(x + y) % lf.p_int for x, y in zip(xs, ys)]
        assert lf.to_int(limb.sub_jit(lf, a, b)) == [(x - y) % lf.p_int for x, y in zip(xs, ys)]

    def test_mont_mul(self, lf):
        xs = rand_elems(lf, 32) + [0, 1, lf.p_int - 1, lf.p_int - 1]
        ys = rand_elems(lf, 32) + [lf.p_int - 1, 1, lf.p_int - 1, 0]
        am = jnp.asarray(lf.encode(xs))
        bm = jnp.asarray(lf.encode(ys))
        got = lf.decode(limb.mul_jit(lf, am, bm))
        assert got == [(x * y) % lf.p_int for x, y in zip(xs, ys)]

    def test_pow5(self, lf):
        xs = rand_elems(lf, 8)
        am = jnp.asarray(lf.encode(xs))
        assert lf.decode(limb.pow5_jit(lf, am)) == [pow(x, 5, lf.p_int) for x in xs]

    def test_inv(self, lf):
        xs = rand_elems(lf, 4) + [1, 2]
        am = jnp.asarray(lf.encode(xs))
        assert lf.decode(limb.inv_jit(lf, am)) == [pow(x, -1, lf.p_int) for x in xs]

    def test_batch_shapes(self, lf):
        xs = np.array(rand_elems(lf, 12)).reshape(3, 4)
        a = jnp.asarray(lf.encode([int(v) for v in xs.ravel()])).reshape(3, 4, limb.N)
        out = limb.mul_jit(lf, a, a)
        assert out.shape == (3, 4, limb.N)
        flat = lf.decode(out.reshape(12, limb.N))
        assert flat == [(int(v) * int(v)) % lf.p_int for v in xs.ravel()]


def test_moduli_match_reference():
    # The circuit field is the modulus the reference pins into CirC
    # (/root/reference/src/backend/r1cs_helper.rs:37-39).
    assert F.Q == 28948022309329048855892746252171976963363056481941647379679742748393362948097
    # Pasta cycle sanity: both 255-bit primes.
    assert F.P.bit_length() == F.Q.bit_length() == 255
