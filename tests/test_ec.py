"""Pasta EC: host group law + device complete-formula kernels vs oracle."""

import random

import numpy as np
import pytest

from reef_tpu.ec import msm as M
from reef_tpu.ec.pasta import PALLAS, VESTA
from reef_tpu.ops import field as F

RNG = random.Random(5)


@pytest.mark.parametrize("cv", [PALLAS, VESTA], ids=["pallas", "vesta"])
class TestHostCurve:
    def test_generator_on_curve(self, cv):
        assert cv.on_curve(cv.gen)

    def test_group_law(self, cv):
        g = cv.gen
        g2 = cv.add(g, g)
        g3 = cv.add(g2, g)
        assert cv.on_curve(g2) and cv.on_curve(g3)
        assert cv.add(g, g2) == cv.add(g2, g)
        assert cv.mul(3, g) == g3
        assert cv.add(g, cv.neg(g)) is None
        assert cv.add(g, None) == g
        # order * G = identity
        assert cv.mul(cv.order, g) is None

    def test_msm_vs_naive(self, cv):
        pts = [cv.mul(RNG.randrange(1, 1000), cv.gen) for _ in range(7)]
        scalars = [RNG.randrange(cv.order) for _ in range(7)]
        naive = None
        for s, p in zip(scalars, pts):
            naive = cv.add(naive, cv.mul(s, p))
        assert cv.msm(scalars, pts) == naive

    def test_hash_to_curve_deterministic(self, cv):
        a = cv.hash_to_curve(b"test")
        b = cv.hash_to_curve(b"test")
        c = cv.hash_to_curve(b"other")
        assert a == b != c
        assert cv.on_curve(a) and cv.on_curve(c)

    def test_compress_roundtrip(self, cv):
        for pt in [cv.gen, cv.mul(12345, cv.gen), None]:
            assert cv.decompress(cv.compress(pt)) == pt

    def test_native_gens_match_python(self, cv):
        """pasta_derive_gens (C SHA256 + Tonelli-Shanks) must be
        bit-identical to Curve.gens, including offset slices."""
        from reef_tpu.ec.native_msm import derive_gens_packed, \
            _unpack_points
        buf = derive_gens_packed(cv, b"reef/native-gens-test", 0, 64)
        if buf is None:
            pytest.skip("native msm library unavailable")
        pts = _unpack_points(buf, 64)
        assert pts == cv.gens(b"reef/native-gens-test", 64)
        tail = derive_gens_packed(cv, b"reef/native-gens-test", 61, 3)
        assert _unpack_points(tail, 3) == pts[61:64]


def test_device_padd_matches_host():
    ck = M.pallas_kernels()
    cv = PALLAS
    pairs = []
    for _ in range(4):
        a = cv.mul(RNG.randrange(1, 10000), cv.gen)
        b = cv.mul(RNG.randrange(1, 10000), cv.gen)
        pairs.append((a, b))
    # include identity and doubling cases (complete formulas must handle)
    pairs.append((None, cv.gen))
    pairs.append((cv.gen, None))
    g5 = cv.mul(5, cv.gen)
    pairs.append((g5, g5))
    pairs.append((g5, cv.neg(g5)))

    P = ck.to_proj([a for a, _ in pairs])
    Q = ck.to_proj([b for _, b in pairs])
    import jax.numpy as jnp
    out = M.padd(ck, jnp.asarray(P), jnp.asarray(Q))
    got = ck.to_affine(out)
    want = [cv.add(a, b) for a, b in pairs]
    assert got == want


def test_device_tree_reduce_matches_host():
    # eager (unjitted) composition of the complete-add kernel; the jitted
    # 255-bit MSM scan is validated on the real TPU in the verify drive
    # (XLA *CPU* compile time on fused limb graphs is pathological).
    import jax.numpy as jnp
    ck = M.vesta_kernels()
    cv = VESTA
    pts = [cv.mul(RNG.randrange(1, 99999), cv.gen) for _ in range(8)]
    out = M.tree_reduce(ck, jnp.asarray(ck.to_proj(pts)))
    want = None
    for p in pts:
        want = cv.add(want, p)
    assert ck.to_affine(out) == want
