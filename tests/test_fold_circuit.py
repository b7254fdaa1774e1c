"""In-circuit fold-step verification (the IVC per-step relation)."""

import random

import pytest

from reef_tpu.backend.fold_circuit import FoldStepCircuit
from reef_tpu.ec.pasta import PALLAS
from reef_tpu.ops import field as F

cv = PALLAS
RNG = random.Random(91)


@pytest.fixture(scope="module")
def circuit():
    return FoldStepCircuit()


def make_step(circuit, tamper=None):
    g = cv.gen
    U_W = cv.mul(RNG.randrange(1, 10**9), g)
    U_E = cv.mul(RNG.randrange(1, 10**9), g)
    W2 = cv.mul(RNG.randrange(1, 10**9), g)
    T = cv.mul(RNG.randrange(1, 10**9), g)
    state_in = [RNG.randrange(F.P) for _ in range(5)]
    inputs, r, state_out = circuit.witness(
        state_in, U_W, U_E, u_in=1, x_digest=123, W2=W2, x2_digest=456, T=T)
    if tamper:
        tamper(inputs)
    vec = circuit.compiled.witness(inputs)
    return circuit.compiled.check_all(vec), r


def test_fold_step_verifies(circuit):
    bad, r = make_step(circuit)
    assert bad is None
    assert 0 < r < F.P


def test_fold_step_rejects_wrong_fold(circuit):
    def tamper(inputs):
        # claim a different folded W commitment
        wrong = cv.add(cv.decompress((inputs["Wf_cx"], inputs["Wf_cflag"])),
                       cv.gen)
        inputs["Wf_cx"], inputs["Wf_cflag"] = cv.compress(wrong)
        inputs["Wf_y"] = wrong[1]
    bad, _ = make_step(circuit, tamper)
    assert bad is not None


def test_fold_step_rejects_offcurve_point(circuit):
    def tamper(inputs):
        inputs["W2_y"] = (inputs["W2_y"] + 1) % F.P
    bad, _ = make_step(circuit, tamper)
    assert bad is not None


def test_fold_step_rejects_wrong_sponge_out(circuit):
    def tamper(inputs):
        inputs["sp_out_2"] = (inputs["sp_out_2"] + 1) % F.P
    bad, _ = make_step(circuit, tamper)
    assert bad is not None


def test_constraint_count(circuit):
    # two 255-bit scalar muls + transcript + decompositions: well under the
    # reference's V1+V2 folding overhead ballpark (costs.rs:7-8)
    n = circuit.compiled.num_constraints
    assert n < 25000, n
