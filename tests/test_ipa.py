"""Log-round IPA: direct roundtrip + as the Hyrax eval argument."""

import random
import secrets

import pytest

from reef_tpu.backend import commitment as C
from reef_tpu.backend.ipa import IpaProof, ipa_prove, ipa_verify
from reef_tpu.ops import field as F

f = F.FQ
RNG = random.Random(41)


def test_ipa_direct_roundtrip():
    n = 8
    gens = C.PedersenGens(C.PALLAS, b"ipa_test", n)
    G_s = C.shared_scalar_gens().G[0]
    w = [RNG.randrange(f.p) for _ in range(n)]
    R = [RNG.randrange(f.p) for _ in range(n)]
    rho = RNG.randrange(f.p)
    v = sum(a * b for a, b in zip(w, R)) % f.p
    r_v = RNG.randrange(f.p)
    cv = C.PALLAS
    C_w = cv.add(cv.mul(rho, gens.H), cv.msm(w, gens.G))
    C_v = cv.add(cv.mul(v, G_s), cv.mul(r_v, gens.H))
    proof = ipa_prove(gens, G_s, w, rho, R, v, r_v, C_w, C_v,
                      C.Transcript(b"t"))
    assert len(proof.Ls) == 3
    assert ipa_verify(gens, G_s, R, C_w, C_v, proof, C.Transcript(b"t"))
    # wrong v rejected
    C_v_bad = cv.add(cv.mul((v + 1) % f.p, G_s), cv.mul(r_v, gens.H))
    assert not ipa_verify(gens, G_s, R, C_w, C_v_bad, proof,
                          C.Transcript(b"t"))
    # tampered proof rejected
    bad = IpaProof(proof.Ls, proof.Rs, (proof.a_final + 1) % f.p,
                   proof.rho_final)
    assert not ipa_verify(gens, G_s, R, C_w, C_v, bad, C.Transcript(b"t"))


def test_hyrax_eval_with_ipa():
    n_vars = 4
    coeffs = [RNG.randrange(f.p) for _ in range(1 << n_vars)]
    pc = C.HyraxPC(b"ipa_hyrax", n_vars)
    commit, blinds = pc.commit(coeffs)
    q = [RNG.randrange(f.p) for _ in range(n_vars)]
    v = pc.evaluate(coeffs, q)
    v_blind = secrets.randbelow(f.p)
    v_commit = pc.sc_gens.commit([v], v_blind)
    proof = pc.prove_eval(coeffs, commit, blinds, q, v, v_blind,
                          C.Transcript(b"t"))
    assert not isinstance(proof, C.SigmaEvalProof)  # IPA is the default now
    assert pc.verify_eval(commit, q, v_commit, proof, C.Transcript(b"t"))
    bad_commit = pc.sc_gens.commit([(v + 1) % f.p], v_blind)
    assert not pc.verify_eval(commit, q, bad_commit, proof,
                              C.Transcript(b"t"))


def test_native_ipa_materialization_bit_identical():
    """Basis materialization (REEF_IPA_MAT_G) is transparent: the round
    outputs (cL, cR, L, R) and the final folded scalar must be bit-identical
    to the unmaterialized indexed-MSM path for every threshold."""
    import os

    from reef_tpu.ec import native_msm as NM
    from reef_tpu.ec.pasta import PALLAS, VESTA

    if NM._load() is None:
        pytest.skip("native msm unavailable")

    for cv in (PALLAS, VESTA):
        n = 256
        gens = C.PedersenGens(cv, b"ipa_mat_test", n)
        packed = bytes(gens.packed_G())
        p = cv.order
        w = [RNG.randrange(p) for _ in range(n)]
        R = [RNG.randrange(p) for _ in range(n)]
        xs = [RNG.randrange(1, p) for _ in range(8)]
        outs = {}
        old = os.environ.get("REEF_IPA_MAT_G")
        try:
            for G in (0, 2, 4, 8):
                os.environ["REEF_IPA_MAT_G"] = str(G)
                eng = NM.IpaNative(cv, w, R, packed)
                seq = []
                for x in xs:
                    seq.append(eng.cross())
                    eng.fold(x)
                seq.append(eng.final())
                eng.close()
                outs[G] = seq
        finally:
            if old is None:
                os.environ.pop("REEF_IPA_MAT_G", None)
            else:
                os.environ["REEF_IPA_MAT_G"] = old
        assert outs[2] == outs[0]
        assert outs[4] == outs[0]
        assert outs[8] == outs[0]
