"""IVC-layer tests: constant proof size, tamper rejection, base cases.

The e2e suite exercises the full pipeline; these tests pin the IVC
properties themselves (the reference's RecursiveSNARK/CompressedSNARK
contract, framework.rs:642-754)."""

import pytest

from reef_tpu.backend import framework as FW
from reef_tpu.backend import ivc as IVC
from reef_tpu.frontend import parser, regex as R
from reef_tpu.frontend.safa import SAFA
from reef_tpu.ops import field as F
from reef_tpu.utils import serialize as SZ

f = F.FQ


@pytest.fixture(scope="module")
def smoke():
    r = R.simpl(parser.parse(".*b"))
    safa = SAFA("ab", r)
    codes = [ord(c) for c in "aaaaaaaab"]
    commit, dc = FW.run_committer(codes, safa.ab, False, seed=21)
    proofs = FW.run_prover(commit, dc, safa, codes, batch_size=2)
    return safa, codes, commit, proofs


def test_ivc_accepts(smoke):
    safa, codes, commit, proofs = smoke
    assert FW.run_verifier(commit, safa, proofs, batch_size=2)


def test_ivc_proof_is_constant_size():
    """The whole point of VERDICT r1 item #1: proof size must not grow
    with the fold count.  Anchored `^a*b$` has no skip edges, so the trace
    (and the fold count) grows with the document; the proof must not."""
    r = R.simpl(parser.parse("^a*b$"))

    def run(doc):
        safa = SAFA("ab", r)
        codes = [ord(c) for c in doc]
        commit, dc = FW.run_committer(codes, safa.ab, False, seed=22)
        proofs = FW.run_prover(commit, dc, safa, codes, batch_size=2)
        assert FW.run_verifier(commit, safa, proofs, batch_size=2)
        return proofs.ivc.n_steps, len(SZ.dumps("proof", proofs))

    steps_small, small = run("aab")
    steps_big, big = run("a" * 14 + "b")
    assert steps_big >= steps_small + 4
    # doc MLE grows with the doc (consistency running_q, IPA rounds):
    # allow a small logarithmic allowance, nothing linear in #folds
    assert big <= small + 2048, (small, big)


@pytest.mark.parametrize("field_name", [
    "n_steps", "zn", "U1_u", "U1_x", "U2_x", "u2_x", "U1_W", "U2_E",
    "u2_W", "T_last"])
def test_ivc_tamper_rejected(smoke, field_name):
    safa, codes, commit, proofs = smoke
    import copy
    p2 = copy.deepcopy(proofs)
    ivc = p2.ivc
    v = getattr(ivc, field_name)
    if isinstance(v, int):
        setattr(ivc, field_name, v + 1)
    elif isinstance(v, list):
        v = list(v)
        v[0] = (v[0] + 1) % f.p
        setattr(ivc, field_name, v)
    else:  # compressed point (x, flag)
        x, flag = v
        setattr(ivc, field_name, ((x + 1) % f.p, flag))
    assert not FW.run_verifier(commit, safa, p2, batch_size=2)


def test_ivc_base_case_z0_binding(smoke):
    """At step 0 the h_in hash check is multiplied out (is_base=1), so
    z_in must be bound to the public z0 by dedicated constraints
    (ivc_circuit.py AugmentedPrimary) — without them a prover could start
    the chain from an arbitrary state.  Craft the honest step-0 primary
    witness, then forge z0: the circuit must become unsatisfiable."""
    from reef_tpu.backend.ivc import (RecursiveSNARK, default_relaxed,
                                      dummy_strict)
    from reef_tpu.backend.witness import solve_and_batch
    safa, codes, commit, proofs = smoke
    udoc = FW.doc_transform(safa.ab, codes)
    tt, circuit, aug, shape, wc, ec, mc = FW.pub_setup(
        safa, commit, 2, False, False, False, udoc)
    salt = commit.hash_salt()
    z0 = circuit.z0(salt, tt.table[0])
    wits, _ = next(iter(solve_and_batch(tt, circuit, codes,
                                        commit.doc_commit_hash(), salt)))
    rs = RecursiveSNARK(aug, shape, wc, ec, z0)
    inputs = dict(wits)
    inputs.update(aug.ivc_witness(rs.pp, rs.z0, default_relaxed(),
                                  dummy_strict(), None))
    wires = aug.compiled.witness_packed(inputs)
    assert aug.compiled.check_all(list(wires)) is None   # honest base case
    forged = dict(inputs)
    forged["ivc_z0_0"] = (forged["ivc_z0_0"] + 1) % f.p
    wires = aug.compiled.witness_packed(forged)
    assert aug.compiled.check_all(list(wires)) is not None


def test_ivc_zero_steps_rejected(smoke):
    safa, codes, commit, proofs = smoke
    import copy
    p2 = copy.deepcopy(proofs)
    p2.ivc.n_steps = 0
    assert not FW.run_verifier(commit, safa, p2, batch_size=2)


def test_ivc_single_step():
    r = R.simpl(parser.parse("^ba$"))
    safa = SAFA("ab", r)
    codes = [ord(c) for c in "ba"]
    commit, dc = FW.run_committer(codes, safa.ab, False, seed=23)
    proofs = FW.run_prover(commit, dc, safa, codes, batch_size=4)
    assert proofs.ivc.n_steps >= 1
    assert FW.run_verifier(commit, safa, proofs, batch_size=4)


def test_ivc_proof_roundtrips_codec(smoke):
    safa, codes, commit, proofs = smoke
    data = SZ.dumps("proof", proofs)
    back = SZ.loads(data, "proof")
    assert back.ivc.n_steps == proofs.ivc.n_steps
    assert back.ivc.zn == list(proofs.ivc.zn)
    assert FW.run_verifier(commit, safa, back, batch_size=2)
