"""Full end-to-end SNARK tests: commit -> prove -> verify.

Mirrors the reference's backend_test suite (framework.rs:1013-1173,
e2e_nl_nl / e2e_hybrid / e2e_merkle + negative tampering) on small inputs.
These are the expensive tests (the reference's CI skips them; they run here
because the instances are tiny)."""

import pytest

from reef_tpu.backend import framework as FW
from reef_tpu.frontend import parser, regex as R
from reef_tpu.frontend.safa import SAFA
from reef_tpu.ops import field as F

pytestmark = pytest.mark.e2e

f = F.FQ


def e2e(rstr, ab, doc, batch_size=2, hybrid=False, merkle=False,
        projections=False, negate=False):
    r = R.simpl(parser.parse(rstr))
    safa = SAFA(ab, r)
    if negate:
        safa = safa.negate()
    codes = [ord(c) for c in doc]
    commit, dc_secret = FW.run_committer(codes, safa.ab, merkle, seed=7)
    proofs = FW.run_prover(commit, dc_secret, safa, codes,
                           batch_size=batch_size, projections=projections,
                           hybrid=hybrid, merkle=merkle)
    ok = FW.run_verifier(commit, safa, proofs, batch_size=batch_size,
                         projections=projections, hybrid=hybrid,
                         merkle=merkle)
    return commit, proofs, ok


def test_e2e_nl_nl():
    # the reference's own smoke case (README.md:61-67): '.*b' over aaaaaaaab
    _, _, ok = e2e(".*b", "ab", "aaaaaaaab")
    assert ok


def test_e2e_merkle():
    _, _, ok = e2e("^baa$", "ab", "baa", merkle=True)
    assert ok


def test_e2e_hybrid():
    _, _, ok = e2e("^baa$", "ab", "baa", hybrid=True)
    assert ok


def test_e2e_forall():
    _, _, ok = e2e("^(?=a.*).*b$", "ab", "aab")
    assert ok


def test_e2e_negate():
    _, _, ok = e2e("^ab$", "ab", "aa", negate=True)
    assert ok


def test_e2e_tampered_proof_rejected():
    r = R.simpl(parser.parse("^baa$"))
    safa = SAFA("ab", r)
    codes = [ord(c) for c in "baa"]
    commit, dc_secret = FW.run_committer(codes, safa.ab, False, seed=8)
    proofs = FW.run_prover(commit, dc_secret, safa, codes, batch_size=2)
    # tamper: claim a different exit state in zn (hash-chain must reject)
    proofs.ivc.zn = list(proofs.ivc.zn)
    proofs.ivc.zn[0] = (proofs.ivc.zn[0] + 1) % f.p
    assert not FW.run_verifier(commit, safa, proofs, batch_size=2)


def test_e2e_unbound_running_q_rejected():
    """ADVICE r1 (high): the doc MLE is multilinear, so a malicious prover
    can pick a fake prefix q'[:-1] and SOLVE the last coordinate so that
    committed-doc~(q') = v, then produce a perfectly valid eval proof at
    q' — unlinking the committed document from the circuit's claim.  The
    verifier must recompute the expected eval point from zn and reject any
    other running_q."""
    from reef_tpu.backend import commitment as CM
    from reef_tpu.backend.commitment import HyraxPC, Transcript
    p = f.p
    r = R.simpl(parser.parse("^baa$"))
    safa = SAFA("ab", r)
    codes = [ord(c) for c in "baa"]
    commit, dc = FW.run_committer(codes, safa.ab, False, seed=11)
    proofs = FW.run_prover(commit, dc, safa, codes, batch_size=2)
    assert FW.run_verifier(commit, safa, proofs, batch_size=2)

    cp = proofs.consist
    pc = HyraxPC(b"doc", dc.n_vars)
    v = pc.evaluate(dc._coeffs, cp.running_q)
    # forge: different prefix, last coordinate solved for the same v
    prefix = [(x + 1) % p for x in cp.running_q[:-1]]
    a = pc.evaluate(dc._coeffs, prefix + [0])
    b = pc.evaluate(dc._coeffs, prefix + [1])
    assert a != b, "degenerate test point; pick another prefix"
    t_last = (v - a) * pow(b - a, p - 2, p) % p
    q_fake = prefix + [t_last]
    assert pc.evaluate(dc._coeffs, q_fake) == v
    v_blind = 5
    v_commit = pc.sc_gens.commit([v], v_blind)
    eval_proof = pc.prove_eval(dc._coeffs, dc.commit, dc._blinds, q_fake,
                               v, v_blind, Transcript(b"dot_prod_proof"))
    cp_forged = CM.ConsistencyProof(
        cp.hash_d, CM.PALLAS.compress(v_commit), None, eval_proof, q_fake,
        None, None)
    cap_forged = FW.cap_prove(v, commit.hash_salt(), v_blind)
    # the forged consistency proof is internally valid...
    assert CM.verify_consistency(commit.nldoc, cp_forged)
    proofs.consist = cp_forged
    proofs.cap = cap_forged
    # ...but the verifier now binds running_q to zn and rejects
    assert not FW.run_verifier(commit, safa, proofs, batch_size=2)


def test_e2e_wrong_flags_rejected():
    r = R.simpl(parser.parse("^baa$"))
    safa = SAFA("ab", r)
    codes = [ord(c) for c in "baa"]
    commit, dc_secret = FW.run_committer(codes, safa.ab, False, seed=9)
    proofs = FW.run_prover(commit, dc_secret, safa, codes, batch_size=2)
    # verifying with a different batch size derives a different circuit
    assert not FW.run_verifier(commit, safa, proofs, batch_size=3)


def test_e2e_auto_batch():
    """Auto batch (-b 0): the calibrated cost model must pick the SAME
    batch on the prover and verifier sides (all inputs public) and prove a
    trace-bound anchored regex end-to-end."""
    _, _, ok = e2e("^a*b$", "ab", "a" * 15 + "b", batch_size=0)
    assert ok
