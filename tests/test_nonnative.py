"""Non-native fold gadget tests: Fq-mod-P folds inside an Fp circuit and
vice versa, against host big-int arithmetic, plus soundness negatives."""

import random

import pytest

from reef_tpu.backend import nonnative as NN
from reef_tpu.backend.r1cs import CompiledCircuit, ConstraintSystem
from reef_tpu.ops import field as F


def _build(field, M, b_const=None):
    cs = ConstraintSystem(field)
    a = NN.nn_input(cs, "a")
    if b_const is None:
        b = NN.nn_input(cs, "b")
    else:
        b = b_const
    r = cs.input("r")
    cs.bits(r, 128, "r_range")
    out = NN.nn_fold(cs, a, b, r, M, "f")
    # expose result limbs
    for i in range(NN.N_LIMBS):
        o = cs.aux(f"out{i}", lambda z, i=i: cs.eval_lc(out.limbs[i], z))
        cs.enforce_eq(o, out.limbs[i])
    return cs, CompiledCircuit(cs)


@pytest.mark.parametrize("field,M", [(F.FP, F.Q), (F.FQ, F.P)])
def test_nn_fold_matches_host(field, M):
    rng = random.Random(42)
    cs, circ = _build(field, M)
    for _ in range(6):
        a = rng.randrange(M)
        b = rng.randrange(M)
        r = rng.randrange(1 << 128)
        ins = {**NN.nn_witness("a", a), **NN.nn_witness("b", b), "r": r}
        z = circ.witness(ins)
        assert circ.check_all(z) is None
        got = NN.from_limbs([z[cs.names[f"out{i}"]]
                             for i in range(NN.N_LIMBS)])
        assert got == (a + r * b) % M


def test_nn_fold_const_b():
    # u' = u + r*1 mod M (the u-fold case)
    cs, circ = _build(F.FP, F.Q, b_const=1)
    rng = random.Random(7)
    for _ in range(4):
        a = rng.randrange(F.Q)
        r = rng.randrange(1 << 128)
        ins = {**NN.nn_witness("a", a), "r": r}
        z = circ.witness(ins)
        assert circ.check_all(z) is None
        got = NN.from_limbs([z[cs.names[f"out{i}"]]
                             for i in range(NN.N_LIMBS)])
        assert got == (a + r) % F.Q


def test_nn_fold_edge_values():
    cs, circ = _build(F.FP, F.Q)
    for a, b, r in [(0, 0, 0), (F.Q - 1, F.Q - 1, (1 << 128) - 1),
                    (0, F.Q - 1, 1), (F.Q - 1, 0, (1 << 128) - 1)]:
        ins = {**NN.nn_witness("a", a), **NN.nn_witness("b", b), "r": r}
        z = circ.witness(ins)
        assert circ.check_all(z) is None
        got = NN.from_limbs([z[cs.names[f"out{i}"]]
                             for i in range(NN.N_LIMBS)])
        assert got == (a + r * b) % F.Q


def test_nn_fold_tampered_result_rejected():
    cs, circ = _build(F.FP, F.Q)
    a, b, r = 12345, 67890, (1 << 127) + 3
    ins = {**NN.nn_witness("a", a), **NN.nn_witness("b", b), "r": r}
    z = circ.witness(ins)
    assert circ.check_all(z) is None
    # tamper the witnessed output limb 0 (+1): some constraint must break
    z2 = list(z)
    z2[cs.names["f_o0"]] = (z2[cs.names["f_o0"]] + 1) % cs.f.p
    assert circ.check_all(z2) is not None
    # tamper the quotient k
    z3 = list(z)
    z3[cs.names["f_k"]] = (z3[cs.names["f_k"]] + 1) % cs.f.p
    assert circ.check_all(z3) is not None


def test_nn_noncanonical_result_rejected():
    """A result witness of a'+M (still < 2^255) must fail the canonical
    check even though the integer fold equation admits it with k-1."""
    cs, circ = _build(F.FP, F.Q)
    rng = random.Random(9)
    a = rng.randrange(F.Q // 2)
    b = rng.randrange(F.Q)
    r = rng.randrange(1, 1 << 128)
    ins = {**NN.nn_witness("a", a), **NN.nn_witness("b", b), "r": r}
    z = circ.witness(ins)
    total = a + r * b
    res, k = total % F.Q, total // F.Q
    if res + F.Q >= (1 << (NN.LIMB_BITS * NN.N_LIMBS)) or k == 0:
        pytest.skip("edge draw; non-canonical rep does not fit")
    bad = res + F.Q
    z2 = list(z)
    for i, l in enumerate(NN.limbs_of(bad)):
        z2[cs.names[f"f_o{i}"]] = l
    z2[cs.names["f_k"]] = k - 1
    # recompute downstream aux deterministically is not possible by hand;
    # instead rebuild the witness from scratch is not supported for
    # tampered values — check_all on the partially-patched vector must
    # fail in either the fold equation or the canonical check
    assert circ.check_all(z2) is not None
