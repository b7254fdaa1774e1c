"""Merkle commitment: tree build, path wits, and the full merkle-mode
step-circuit integration (mirrors r1cs.rs `merkle` test + merkle_tree.rs
tests)."""

import random

from reef_tpu.backend.merkle import MerkleCommitment
from reef_tpu.backend.step_circuit import StepCircuit
from reef_tpu.backend.table import TransitionTable, doc_transform
from reef_tpu.backend.witness import solve_and_batch
from reef_tpu.frontend import parser, regex as R
from reef_tpu.frontend.safa import SAFA

RNG = random.Random(21)


def test_path_wits_verify():
    doc = [RNG.randrange(100) for _ in range(16)]
    mc = MerkleCommitment(doc)
    for idx in range(16):
        wits = mc.path_wits(idx)
        assert mc.verify_path(idx, doc[idx], wits)
        # wrong char fails
        assert not mc.verify_path(idx, doc[idx] + 1, wits)


def test_merkle_mode_circuit():
    rstr, ab, doc = "^baa$", "ab", "baa"
    r = R.simpl(parser.parse(rstr))
    safa = SAFA(ab, r)
    codes = [ord(c) for c in doc]
    udoc = doc_transform(safa.ab, codes)
    tt = TransitionTable(safa, udoc, len(udoc), len(codes), batch_size=2,
                         merkle=True)
    mc = MerkleCommitment(udoc)
    circuit = StepCircuit(tt, 0, merkle_commitment=mc)

    z = None
    for wits, res in solve_and_batch(tt, circuit, codes, 0, 0x5A17,
                                     merkle_commitment=mc):
        vec = circuit.compiled.witness(wits)
        bad = circuit.compiled.check_all(vec)
        assert bad is None, f"constraint {bad} failed"
        outs = circuit.compiled.outputs(vec)
        if z is not None:
            zin = [wits[name] for name in circuit.z_in_names]
            assert zin == z
        z = outs
    assert z[0] == tt.exit_state


def test_merkle_bad_path_rejected():
    rstr, ab, doc = "^ab$", "ab", "ab"
    r = R.simpl(parser.parse(rstr))
    safa = SAFA(ab, r)
    codes = [ord(c) for c in doc]
    udoc = doc_transform(safa.ab, codes)
    tt = TransitionTable(safa, udoc, len(udoc), len(codes), batch_size=2,
                         merkle=True)
    mc = MerkleCommitment(udoc)
    circuit = StepCircuit(tt, 0, merkle_commitment=mc)
    gen = solve_and_batch(tt, circuit, codes, 0, 0x5A17,
                          merkle_commitment=mc)
    wits, _ = next(gen)
    wits["merkle_w1_0"] = (wits["merkle_w1_0"] + 1)  # corrupt sibling char
    vec = circuit.compiled.witness(wits)
    assert circuit.compiled.check_all(vec) is not None
