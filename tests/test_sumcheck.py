"""Sumcheck/MLE kernel invariants (mirrors r1cs.rs:2411-2578 test strategy)."""

import random

import pytest

from reef_tpu.backend import sumcheck as SC
from reef_tpu.ops import field as F

f = F.FQ
RNG = random.Random(99)


def rand_table(ell):
    return [RNG.randrange(f.p) for _ in range(1 << ell)]


@pytest.mark.parametrize("ell,m", [(3, 4), (5, 7), (8, 3)])
def test_mle_linear_basic(ell, m):
    """Each round satisfies g(0)+g(1)=claim; the final claim dominoes into
    eq(r) * T(r); the initial claim equals <eq_table, T>."""
    table = rand_table(ell)
    qs = [RNG.randrange(len(table)) for _ in range(m)]
    vs = [table[q] for q in qs]
    prev_q = [RNG.randrange(f.p) for _ in range(ell)]
    prev_v = SC.verifier_mle_eval(f, table, prev_q)

    proof = SC.nlookup_prove(f, table, qs, vs, prev_q, prev_v, "nl")
    assert SC.nlookup_verify_claim(f, proof, qs, vs, prev_q, prev_v)

    # next_running_v is the table MLE at the sumcheck point
    assert proof.next_running_v == SC.verifier_mle_eval(
        f, table, proof.sc_rs)

    # initial claim == sum_j T[j] * eq_t[j]
    rs = [proof.claim_r]
    for _ in range(m):
        rs.append(rs[-1] * proof.claim_r % f.p)
    eq_t = SC.gen_eq_table(f, rs, qs, prev_q)
    total = sum(t * e for t, e in zip(table, eq_t)) % f.p
    lhs = 0
    for c in reversed(vs + [prev_v]):
        lhs = (lhs + c) * proof.claim_r % f.p
    assert lhs == total


def test_bad_lookup_rejected():
    ell, m = 4, 3
    table = rand_table(ell)
    qs = [1, 2, 3]
    vs = [table[1], (table[2] + 1) % f.p, table[3]]  # wrong v_2
    prev_q = [0] * ell
    prev_v = table[0]
    proof = SC.nlookup_prove(f, table, qs, vs, prev_q, prev_v, "nl")
    assert not SC.nlookup_verify_claim(f, proof, qs, vs, prev_q, prev_v)


def test_mle_partial():
    """Brute-force prover_mle_partial_eval on all boolean and hole points
    (mirrors `mle_partial`, r1cs.rs:2500-2578)."""
    ell = 3
    table = rand_table(ell)
    es = list(range(len(table)))
    # full boolean points: evaluation == table entry
    for idx in range(1 << ell):
        x = [(idx >> (ell - 1 - j)) & 1 for j in range(ell)]
        _, con = SC.prover_mle_partial_eval(f, table, x, es, True, None)
        assert con == table[idx] % f.p
    # hole consistency: f(x with hole=b) == const + b*coeff
    for hole_pos in range(ell):
        for idx in range(1 << ell):
            x = [(idx >> (ell - 1 - j)) & 1 for j in range(ell)]
            xh = list(x)
            xh[hole_pos] = -1
            coeff, con = SC.prover_mle_partial_eval(f, table, xh, es, True, None)
            want = table[idx] % f.p
            got = (con + x[hole_pos] * coeff) % f.p
            assert got == want


def test_eq_table_running_claim_only():
    ell = 4
    prev_q = [RNG.randrange(f.p) for _ in range(ell)]
    rs = [7]
    eq_t = SC.gen_eq_table(f, rs, [], prev_q)
    # <T, eq_t> == 7 * T~(prev_q) for any table
    table = rand_table(ell)
    lhs = sum(t * e for t, e in zip(table, eq_t)) % f.p
    rhs = 7 * SC.verifier_mle_eval(f, table, prev_q) % f.p
    assert lhs == rhs


def test_combine_qs_matches_circuit_convention():
    # all-bits-set qs: the final bit is dropped by protocol convention
    sc_l, m = 4, 2
    qs = [0b1111, 0b1111]
    cqs = SC.combine_qs(qs, sc_l, m)
    assert len(cqs) == 1
    assert cqs[0] == (1 << (m * sc_l - 1)) - 1
