"""Folding (Nova algebra) + Spartan compression on a small synthetic circuit."""

import random

import pytest

from reef_tpu.backend.nova import (FoldingProver, R1CSShape, VectorCommitter,
                                   verify_fold_chain)
from reef_tpu.backend.r1cs import CompiledCircuit, ConstraintSystem, lc_const
from reef_tpu.backend.spartan import spartan_prove, spartan_verify
from reef_tpu.ops import field as F

f = F.FQ
RNG = random.Random(31)


def tiny_circuit():
    """x_out = x_in^2 + a*x_in + 7, with a private a; io = (x_in, x_out)."""
    cs = ConstraintSystem(F.FQ)
    x_in = cs.input("x_in")
    a = cs.input("a")
    x_sq = cs.mul(x_in, x_in, "x_sq")
    ax = cs.mul(a, x_in, "ax")
    from reef_tpu.backend.r1cs import lc_add
    out_lc = lc_add(x_sq, ax, lc_const(7))
    x_out = cs.input("x_out")
    cs.enforce_eq(x_out, out_lc)
    # a couple more constraints for bulk
    b = cs.mul(x_sq, ax, "b")
    c = cs.mul(b, b, "c")
    return CompiledCircuit(cs)


def make_chain(n_steps):
    circ = tiny_circuit()
    shape = R1CSShape(circ, ["x_in", "x_out"])
    wc = VectorCommitter(shape.w_pad)
    ec = VectorCommitter(shape.n_cons)
    prover = FoldingProver(shape, wc, ec)
    x = 3
    for i in range(n_steps):
        a = RNG.randrange(100)
        x_out = (x * x + a * x + 7) % f.p
        wires = circ.witness({"x_in": x, "a": a, "x_out": x_out})
        assert circ.check_all(wires) is None
        prover.fold_step(wires)
        x = x_out
    return shape, wc, ec, prover


def test_fold_chain_and_relaxed_sat():
    shape, wc, ec, prover = make_chain(4)
    U, Wit = prover.U, prover.Wit
    # folded witness satisfies the relaxed relation
    assert shape.check_relaxed(Wit.W, Wit.E, U.u, U.x)
    # verifier-side folding agrees on the public instance
    U2 = verify_fold_chain(shape, ec, prover.steps)
    assert U2.u == U.u and U2.x == U.x
    assert U2.comm_W == U.comm_W
    assert U2.comm_E == U.comm_E


def test_spartan_roundtrip():
    shape, wc, ec, prover = make_chain(3)
    proof = spartan_prove(shape, wc, ec, prover.U, prover.Wit)
    assert spartan_verify(shape, wc, ec, prover.U, proof)


def test_spartan_rejects_bad_witness():
    shape, wc, ec, prover = make_chain(2)
    # corrupt the folded witness
    prover.Wit.W[0] = (prover.Wit.W[0] + 1) % f.p
    with pytest.raises(AssertionError):
        # prover sanity assertions fire on inconsistent claims
        proof = spartan_prove(shape, wc, ec, prover.U, prover.Wit)
        assert not spartan_verify(shape, wc, ec, prover.U, proof)


def test_spartan_rejects_tampered_proof():
    shape, wc, ec, prover = make_chain(2)
    proof = spartan_prove(shape, wc, ec, prover.U, prover.Wit)
    proof.vA = (proof.vA + 1) % f.p
    assert not spartan_verify(shape, wc, ec, prover.U, proof)


def test_fold_chain_detects_tamper():
    shape, wc, ec, prover = make_chain(3)
    # tamper a step's public io: folded instance no longer matches witness
    steps = list(prover.steps)
    cw, x, ct = steps[1]
    steps[1] = (cw, [x[0], (x[1] + 1) % f.p], ct)
    U2 = verify_fold_chain(shape, ec, steps)
    assert U2.x != prover.U.x or U2.u != prover.U.u


def test_spartan_rejects_tampered_batched_opening():
    """The batched-opening pieces (sc3 rounds, the reduced evals vE2/vW2,
    and the single combined IPA) each bind; tampering any one rejects."""
    import copy
    shape, wc, ec, prover = make_chain(2)
    proof = spartan_prove(shape, wc, ec, prover.U, prover.Wit)

    p1 = copy.deepcopy(proof)
    p1.vE2 = (p1.vE2 + 1) % f.p
    assert not spartan_verify(shape, wc, ec, prover.U, p1)

    p2 = copy.deepcopy(proof)
    p2.vW2 = (p2.vW2 + 1) % f.p
    assert not spartan_verify(shape, wc, ec, prover.U, p2)

    p3 = copy.deepcopy(proof)
    p3.sc3[0][0] = (p3.sc3[0][0] + 1) % f.p
    assert not spartan_verify(shape, wc, ec, prover.U, p3)

    p4 = copy.deepcopy(proof)
    p4.sc3 = p4.sc3[:-1]                     # truncated reduction
    assert not spartan_verify(shape, wc, ec, prover.U, p4)

    p5 = copy.deepcopy(proof)
    p5.eval.a_final = (p5.eval.a_final + 1) % f.p
    assert not spartan_verify(shape, wc, ec, prover.U, p5)


def test_pure_python_fallback_roundtrip(monkeypatch):
    """With every native library unavailable, the packed-pipeline entry
    points fall back to plain int lists and a small Spartan roundtrip
    still proves/verifies (the 'silent fallback' contract)."""
    import reef_tpu.ec.native_msm as NM
    import reef_tpu.ops.native_fieldvec as FV
    from reef_tpu.backend.r1cs import CompiledCircuit, ConstraintSystem

    monkeypatch.setattr(FV, "_LIB", None)
    monkeypatch.setattr(FV, "_BUILD_FAILED", True)
    monkeypatch.setattr(NM, "_LIB", None)
    monkeypatch.setattr(NM, "_BUILD_FAILED", True)
    assert not FV.available()

    cs = ConstraintSystem(F.FQ)
    a = cs.input("a")
    b = cs.input("b")
    c = cs.mul(a, b)
    cs.enforce_eq(cs.mul(c, c), cs.mul(c, c, "dd"))
    cc = CompiledCircuit(cs)
    from reef_tpu.backend.nova import RelaxedInstance, RelaxedWitness
    wires = cc.witness_packed({"a": 3, "b": 5})
    assert isinstance(wires, list)          # no PackedVec without natives
    shape = R1CSShape(cc, ["a"])
    W, x = shape.split_wires(wires)
    wc = VectorCommitter(shape.w_pad)
    ec = VectorCommitter(shape.n_cons)
    comm_W, blind = wc.commit(W)
    U = RelaxedInstance(comm_W, None, 1, x)
    Wit = RelaxedWitness(W, [0] * shape.n_cons, blind, 0)
    pr = spartan_prove(shape, wc, ec, U, Wit)
    assert spartan_verify(shape, wc, ec, U, pr)
