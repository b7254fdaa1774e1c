"""In-circuit EC gadgets vs the host curve (IVC folding-verifier blocks)."""

import random

import pytest

from reef_tpu.backend import ec_gadgets as G
from reef_tpu.backend.r1cs import CompiledCircuit, ConstraintSystem
from reef_tpu.ec.pasta import PALLAS
from reef_tpu.ops import field as F

RNG = random.Random(71)
cv = PALLAS
fp = F.FP  # pallas base field = the circuit field for pallas-point gadgets


def run(cs, inputs):
    circ = CompiledCircuit(cs)
    vec = circ.witness(inputs)
    return circ, vec, circ.check_all(vec)


def to_affine_from_wires(vec, circ, pw):
    x = circ.cs.eval_lc(pw.X, vec)
    y = circ.cs.eval_lc(pw.Y, vec)
    z = circ.cs.eval_lc(pw.Z, vec)
    if z == 0:
        return None
    zi = pow(z, fp.p - 2, fp.p)
    return (x * zi % fp.p, y * zi % fp.p)


@pytest.mark.parametrize("case", ["generic", "double", "identity", "inverse"])
def test_padd_gadget(case):
    cs = ConstraintSystem(fp)
    P = G.PointWires.alloc(cs, "p")
    Q = G.PointWires.alloc(cs, "q")
    out = G.padd_gadget(cs, P, Q)

    a = cv.mul(RNG.randrange(1, 10**9), cv.gen)
    if case == "generic":
        b = cv.mul(RNG.randrange(1, 10**9), cv.gen)
    elif case == "double":
        b = a
    elif case == "identity":
        b = None
    else:
        b = cv.neg(a)
    inputs = {**G.witness_point(a, "p"), **G.witness_point(b, "q")}
    circ, vec, bad = run(cs, inputs)
    assert bad is None
    assert to_affine_from_wires(vec, circ, out) == cv.add(a, b)


def test_scalar_mul_gadget():
    cs = ConstraintSystem(fp)
    P = G.PointWires.alloc(cs, "p")
    bits = G.bits_input(cs, "k", 16)
    out = G.scalar_mul_gadget(cs, bits, P)
    k = RNG.randrange(1, 1 << 16)
    a = cv.mul(RNG.randrange(1, 10**9), cv.gen)
    inputs = {**G.witness_point(a, "p"), **G.bits_witness("k", k, 16)}
    circ, vec, bad = run(cs, inputs)
    assert bad is None
    assert to_affine_from_wires(vec, circ, out) == cv.mul(k, a)


def test_fold_commit_gadget_roundtrip_and_reject():
    cs = ConstraintSystem(fp)
    C1 = G.PointWires.alloc(cs, "c1")
    C2 = G.PointWires.alloc(cs, "c2")
    Cf = G.PointWires.alloc(cs, "cf")
    r_bits = G.bits_input(cs, "r", 16)
    G.fold_commit_gadget(cs, C1, C2, r_bits, Cf)

    c1 = cv.mul(RNG.randrange(1, 10**9), cv.gen)
    c2 = cv.mul(RNG.randrange(1, 10**9), cv.gen)
    r = RNG.randrange(1, 1 << 16)
    folded = cv.add(c1, cv.mul(r, c2))
    inputs = {**G.witness_point(c1, "c1"), **G.witness_point(c2, "c2"),
              **G.witness_point(folded, "cf"), **G.bits_witness("r", r, 16)}
    circ, vec, bad = run(cs, inputs)
    assert bad is None
    # wrong fold rejected
    wrong = cv.add(folded, cv.gen)
    inputs_bad = dict(inputs)
    inputs_bad.update(G.witness_point(wrong, "cf"))
    vec2 = circ.witness(inputs_bad)
    assert circ.check_all(vec2) is not None


def test_constraint_budget():
    # a 128-bit fold gadget should stay in the Nova-overhead ballpark
    cs = ConstraintSystem(fp)
    C1 = G.PointWires.alloc(cs, "c1")
    C2 = G.PointWires.alloc(cs, "c2")
    Cf = G.PointWires.alloc(cs, "cf")
    r_bits = G.bits_input(cs, "r", 128)
    G.fold_commit_gadget(cs, C1, C2, r_bits, Cf)
    n = len(cs.constraints)
    assert n < 6000, n
