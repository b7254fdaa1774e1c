"""Poseidon permutation + sponge: device kernels vs host oracle."""

import random

import jax.numpy as jnp
import pytest

from reef_tpu.ops import field as F
from reef_tpu.ops import limb, poseidon
from reef_tpu.ops.poseidon import HostSponge, IOPattern
from reef_tpu.ops.poseidon_constants import (host_permutation, poseidon_params,
                                             PARTIAL_ROUNDS)

RNG = random.Random(7)


def test_constants_deterministic_and_in_field():
    rc, mds = poseidon_params(F.Q, 5)
    rc2, mds2 = poseidon_params(F.Q, 5)
    assert rc == rc2 and mds == mds2
    assert len(rc) == (8 + PARTIAL_ROUNDS[5]) * 5
    assert all(0 <= c < F.Q for c in rc)
    # MDS is Cauchy: M[i][j] * (i + 5 + j) == 1 mod Q
    for i in range(5):
        for j in range(5):
            assert (mds[i][j] * (i + 5 + j)) % F.Q == 1


@pytest.mark.parametrize("lf", [limb.FQ, limb.FP], ids=["Fq", "Fp"])
def test_device_permutation_matches_host(lf):
    t = 5
    batch = 8
    states = [[RNG.randrange(lf.p_int) for _ in range(t)] for _ in range(batch)]
    flat = [x for s in states for x in s]
    dev = jnp.asarray(lf.encode(flat)).reshape(batch, t, limb.N)
    out = poseidon.permute_jit(lf, dev, t)
    got = lf.decode(out.reshape(batch * t, limb.N))
    want = [x for s in states for x in host_permutation(lf.p_int, s)]
    assert got == want


def test_hash_elems_batched():
    lf = limb.FQ
    batch = 4
    elems = [[RNG.randrange(lf.p_int) for _ in range(4)] for _ in range(batch)]
    flat = [x for e in elems for x in e]
    dev = jnp.asarray(lf.encode(flat)).reshape(batch, 4, limb.N)
    out = poseidon.hash_elems(lf, dev)
    got = lf.decode(out.reshape(batch, limb.N))
    # host oracle: state = [tag, e0..e3], permute, lane 1
    io = IOPattern([("absorb", 4), ("squeeze", 1)])
    tag = io.tag_int() % lf.p_int
    want = [host_permutation(lf.p_int, [tag] + e)[1] for e in elems]
    assert got == want


def test_sponge_duplex_roundtrip():
    f = F.FQ
    io = IOPattern([("absorb", 3), ("squeeze", 2), ("absorb", 1), ("squeeze", 1)])
    sp = HostSponge(f, io)
    sp.absorb([11, 22, 33])
    s1 = sp.squeeze(2)
    sp.absorb([44])
    s2 = sp.squeeze(1)
    # deterministic
    sp2 = HostSponge(f, io)
    sp2.absorb([11, 22, 33])
    assert sp2.squeeze(2) == s1
    sp2.absorb([44])
    assert sp2.squeeze(1) == s2
    # different IO pattern -> different tag -> different outputs
    io3 = IOPattern([("absorb", 3), ("squeeze", 2)], domain=b"other")
    sp3 = HostSponge(f, io3)
    sp3.absorb([11, 22, 33])
    assert sp3.squeeze(2) != s1
    # absorbing different data changes output
    sp4 = HostSponge(f, io)
    sp4.absorb([11, 22, 34])
    assert sp4.squeeze(2) != s1


def test_sponge_rate_overflow_permutes():
    f = F.FQ
    io = IOPattern([("absorb", 9), ("squeeze", 5)])
    sp = HostSponge(f, io)
    sp.absorb(list(range(1, 10)))  # 9 > rate 4: forces internal permutes
    out = sp.squeeze(5)            # 5 > rate 4: forces permute mid-squeeze
    assert len(out) == 5 and len(set(out)) == 5
    assert all(0 <= o < f.p for o in out)


def test_circuit_poseidon_template_equivalence():
    """The stamped permutation gadget (template path) evaluates identically
    to a direct gadget build AND to the host permutation, for bare-wire and
    mixed-LC inputs, at both sponge widths."""
    import random

    from reef_tpu.backend.r1cs import ConstraintSystem, lc_add, lc_const

    rng = random.Random(11)
    for t in (5, 9):
        for mixed in (False, True):
            vals = [rng.randrange(F.Q) for _ in range(t)]

            def build(direct):
                cs = ConstraintSystem(F.FQ)
                ins = [cs.input(f"x{i}") for i in range(t)]
                if mixed:
                    # non-bare inputs force stamp's binding-wire path
                    state = [lc_add(ins[i], lc_const(i + 1))
                             for i in range(t)]
                    xs = [(v - (i + 1)) % F.Q for i, v in enumerate(vals)]
                else:
                    state = ins
                    xs = vals
                outs = (cs._poseidon_perm_build(state, t) if direct
                        else cs.poseidon_perm(state, t))
                from reef_tpu.backend.r1cs import CompiledCircuit
                cc = CompiledCircuit(cs)
                z = cc.witness({f"x{i}": xs[i] for i in range(t)})
                assert cc.check_all(z) is None
                return [cs.eval_lc(o, z) for o in outs]

            got_direct = build(True)
            got_stamped = build(False)
            assert got_direct == got_stamped
            assert got_stamped == list(host_permutation(F.Q, vals))


def test_circuit_poseidon_stamp_duplicate_input_wires():
    """Two sponge lanes carrying the SAME wire must not lose coefficients
    in the stamped constraint rows (input-collision guard)."""
    import random

    from reef_tpu.backend.r1cs import CompiledCircuit, ConstraintSystem

    rng = random.Random(12)
    v = rng.randrange(F.Q)
    cs = ConstraintSystem(F.FQ)
    x = cs.input("x")
    state = [x, x, x, x, x]
    outs = cs.poseidon_perm(state, 5)
    cc = CompiledCircuit(cs)
    z = cc.witness({"x": v})
    assert cc.check_all(z) is None
    got = [cs.eval_lc(o, z) for o in outs]
    assert got == list(host_permutation(F.Q, [v] * 5))
