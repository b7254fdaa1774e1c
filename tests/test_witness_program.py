"""Native witness-program interpreter vs the python closure evaluator.

Covers every opcode (lc / mul / bit / inv0 / eq0) plus an untagged python
closure mid-program (segment break + lazy sync), on both fields, bit-exact.
Role parity: the reference's StagedWitCompEvaluator (framework.rs:561-572).
"""

import random

import pytest

from reef_tpu.backend.r1cs import (CompiledCircuit, ConstraintSystem,
                                   lc_add, lc_const, lc_sub)
from reef_tpu.ops import field as F
from reef_tpu.ops import native_fieldvec as FV

pytestmark = pytest.mark.skipif(not FV.available(),
                                reason="no native toolchain")


@pytest.mark.parametrize("field", [F.FQ, F.FP])
def test_witness_program_all_opcodes(field):
    rng = random.Random(7)
    cs = ConstraintSystem(field)
    x = cs.input("x")
    y = cs.input("y")
    m = cs.mul(x, y)
    cs.bits(lc_add(m, lc_const(5)), 255, "bb")
    z = cs.is_zero(lc_sub(x, y), "iz")
    w = cs.aux("pyop", lambda zz: (zz[cs.names["x"]] * 7 + 3) % field.p)
    cs.mul(lc_add(w, m), lc_add(z, lc_const(2)))
    cc = CompiledCircuit(cs)
    for trial in range(12):
        ins = {"x": rng.randrange(field.p), "y": rng.randrange(field.p)}
        if trial == 3:
            ins["y"] = ins["x"]          # is_zero -> 1 branch
        if trial == 4:
            ins["x"] = 0                 # zero input
        z_nat = cc.witness(ins)
        cs._native_wit_prog = False      # force python path
        z_py = cc.witness(ins)
        del cs._native_wit_prog
        assert z_nat == z_py
        assert cc.check_all(z_nat) is None
