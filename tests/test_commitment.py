"""Hyrax/Pedersen doc commitment + consistency proof roundtrips."""

import random

import pytest

from reef_tpu.backend import commitment as C
from reef_tpu.backend import sumcheck as SC
from reef_tpu.ops import field as F

f = F.FQ
RNG = random.Random(11)


def test_eq_evals_msb_first():
    point = [3, 5]
    evs = C.eq_evals(f, point)
    # index j: bit1 (MSB) paired with point[0]
    for j in range(4):
        b0 = (j >> 1) & 1
        b1 = j & 1
        want = ((b0 * 3 + (1 - b0) * (1 - 3)) % f.p) * \
               ((b1 * 5 + (1 - b1) * (1 - 5)) % f.p) % f.p
        assert evs[j] == want


def test_hyrax_commit_eval_roundtrip():
    n_vars = 4
    coeffs = [RNG.randrange(f.p) for _ in range(1 << n_vars)]
    pc = C.HyraxPC(b"doc", n_vars)
    commit, blinds = pc.commit(coeffs)
    q = [RNG.randrange(f.p) for _ in range(n_vars)]
    v = pc.evaluate(coeffs, q)
    # cross-check vs generic MLE eval
    assert v == SC.verifier_mle_eval(f, coeffs, q)

    import secrets
    v_blind = secrets.randbelow(f.p)
    v_commit = pc.sc_gens.commit([v], v_blind)
    proof = pc.prove_eval(coeffs, commit, blinds, q, v, v_blind,
                          C.Transcript(b"t"))
    assert pc.verify_eval(commit, q, v_commit, proof, C.Transcript(b"t"))
    # wrong v fails
    bad_commit = pc.sc_gens.commit([(v + 1) % f.p], v_blind)
    assert not pc.verify_eval(commit, q, bad_commit, proof,
                              C.Transcript(b"t"))


def test_doc_commit_consistency_split():
    udoc = [RNG.randrange(200) for _ in range(13)]
    dc = C.commit_doc(udoc, seed=1)
    q = [RNG.randrange(f.p) for _ in range(dc.n_vars)]
    v = SC.verifier_mle_eval(f, dc._coeffs, q)
    proof = C.prove_consistency(dc, [], None, q, v, proj=False, hybrid=False)
    assert C.verify_consistency(dc, proof)
    assert proof.hash_d == C.StepCircuit._hide_host(v, dc.hash_salt)


def test_consistency_rejects_wrong_v():
    udoc = [1, 2, 3, 4]
    dc = C.commit_doc(udoc, seed=2)
    q = [RNG.randrange(f.p) for _ in range(dc.n_vars)]
    v_bad = (SC.verifier_mle_eval(f, dc._coeffs, q) + 1) % f.p
    proof = C.prove_consistency(dc, [], None, q, v_bad, proj=False,
                                hybrid=False)
    assert not C.verify_consistency(dc, proof)


def test_consistency_hybrid():
    # hybrid: q = [q0, q'...]; v = (1-q0)*T~(q') + q0*D~(adjusted q)
    udoc = [RNG.randrange(100) for _ in range(8)]
    dc = C.commit_doc(udoc, seed=3)  # n_vars = 3
    table = [RNG.randrange(f.p) for _ in range(8)]
    # hybrid q length = n_vars + 1
    q = [RNG.randrange(f.p) for _ in range(dc.n_vars + 1)]
    running_q = C.adjust_running_q(dc.n_vars, q, None, False, True)
    v_prime = SC.verifier_mle_eval(f, dc._coeffs, running_q)
    t_val = SC.verifier_mle_eval(f, table, q[1:])
    q0 = q[0] % f.p
    v = ((1 - q0) * t_val + q0 * v_prime) % f.p
    proof = C.prove_consistency(dc, table, None, q, v, proj=False,
                                hybrid=True)
    assert C.verify_consistency(dc, proof, table=table, q=q)


def test_consistency_projections():
    udoc = [RNG.randrange(100) for _ in range(16)]
    dc = C.commit_doc(udoc, seed=4)  # n_vars = 4
    # prove against chunk [8, 16): chunk idx bits = [1] (1 of 2 chunks of 8)
    chunk_idx = [1]
    q = [RNG.randrange(f.p) for _ in range(3)]
    full_q = C.adjust_running_q(dc.n_vars, q, chunk_idx, True, False)
    assert full_q == chunk_idx + q
    v = SC.verifier_mle_eval(f, dc._coeffs, full_q)
    # v also equals the chunk MLE at q
    assert v == SC.verifier_mle_eval(f, dc._coeffs[8:16], q)
    proof = C.prove_consistency(dc, [], chunk_idx, q, v, proj=True,
                                hybrid=False)
    assert C.verify_consistency(dc, proof)


def test_final_clear_checks():
    table = [RNG.randrange(f.p) for _ in range(8)]
    q = [RNG.randrange(f.p) for _ in range(3)]
    v = SC.verifier_mle_eval(f, table, q)
    assert C.final_clear_checks(0, table, q, v)
    assert not C.final_clear_checks(1, table, q, v)
    assert not C.final_clear_checks(0, table, q, v + 1)


def test_hyrax_commit_rows_matches_per_row():
    """The row-batched native commit path (PedersenGens.commit_rows) is
    bit-identical to per-row commits, for full-width and tiny (alphabet
    code) scalars."""
    import random

    rng = random.Random(9)
    pc = C.HyraxPC(b"rows_eq_test", 8)     # 16x16
    for bound in (C.F.Q, 32):
        coeffs = [rng.randrange(bound) for _ in range(1 << 8)]
        blinds = [rng.randrange(C.F.Q) for _ in range(pc.n_rows)]
        commit, _ = pc.commit(coeffs, blinds)
        ref = [pc.vec_gens.commit(
                   coeffs[j * pc.n_cols:(j + 1) * pc.n_cols], blinds[j])
               for j in range(pc.n_rows)]
        assert commit.row_commits == ref
