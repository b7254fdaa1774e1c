"""Extra e2e coverage mirroring the reference's harder cases
(framework.rs e2e_nest_forall / e2e_projections / e2e_q_overflow)."""

import pytest

from tests.test_e2e import e2e
from tests.test_step_circuit import run_case

pytestmark = pytest.mark.e2e


def test_e2e_projections():
    _, _, ok = e2e("^.{36}ACGT$", "ACGT", "A" * 36 + "ACGT",
                   projections=True, batch_size=2)
    assert ok


def test_nested_forall_circuit():
    # lookahead inside a lookahead: nested forall forks
    run_case("^(?=a(?=.*b).*).*c$", "abc", "abc", batch_size=2)


def test_e2e_nest_forall():
    _, _, ok = e2e("^(?=a(?=.*b).*).*c$", "abc", "abc", batch_size=2)
    assert ok


def test_q_overflow_circuit():
    # doc large enough that batch*log(doc) exceeds one 254-bit combined q
    # (mirrors r1cs.rs r1cs_q_overflow with a smaller doc: 22 lookups * 12
    # bits > 254 requires batch 22; instead force multiple combined qs via
    # a moderately big batch on a 4096-char doc)
    doc = "a" * 100 + "b"
    run_case(".*b", "ab", doc, batch_size=26)


def test_password_policy_e2e():
    # stacked lookaheads (password workload, safa.rs:871-911)
    _, _, ok = e2e("^(?=.*[A-Z])(?=.*[a-z]).{6}$", "AaBbZz", "AaBbZz",
                   batch_size=2)
    assert ok


def test_e2e_projections_and_hybrid():
    # combined -p -y (the reference's proj_hybrid mode, r1cs.rs:2844+)
    _, _, ok = e2e("^.{36}ACGT$", "ACGT", "A" * 36 + "ACGT",
                   projections=True, hybrid=True, batch_size=2)
    assert ok


def test_random_snark_e2e_fuzz():
    """Random regex/doc pairs through the FULL pipeline (commit -> IVC
    prove -> compress -> verify) with mode toggles, plus an
    artifact-tamper rejection per case.  The constraint-gate fuzz
    (test_step_circuit) stops at check_all; this exercises the SNARK
    layers end-to-end.  Seeded and bounded."""
    import random
    import re as pyre

    from reef_tpu.frontend import parser
    from reef_tpu.frontend import regex as R
    from reef_tpu.frontend.safa import SAFA
    from reef_tpu.utils import serialize as SZ

    rng = random.Random(31337)

    def gen(depth, look=True):
        if depth == 0:
            return rng.choice(["a", "b", "[ab]", "."])
        p = rng.random()
        if p < 0.3:
            return gen(depth - 1, look) + gen(depth - 1, False)
        if p < 0.55:
            return ("(" + gen(depth - 1, False) + "|"
                    + gen(depth - 1, False) + ")")
        if p < 0.68:
            return "(" + gen(depth - 1, False) + ")*"
        if p < 0.8 and look:
            return "(?=" + gen(depth - 1, False) + ")" + gen(depth - 1, False)
        return gen(depth - 1, look)

    ran = 0
    trial = 0
    while ran < 4 and trial < 200:
        trial += 1
        rstr = "^" + gen(2) + "$"
        negate = rng.random() < 0.25
        try:
            r = R.simpl(parser.parse(rstr))
            safa = SAFA("ab", r)
        except NotImplementedError:
            continue
        if negate:
            safa = safa.negate()
        if safa.num_states() > 40:
            continue
        doc = None
        for _ in range(30):
            cand = "".join(rng.choice("ab")
                           for _ in range(rng.randrange(1, 6)))
            if (pyre.search(rstr, cand) is not None) != negate:
                doc = cand
                break
        if doc is None:
            continue
        hybrid = rng.random() < 0.3
        commit, proofs, ok = e2e(rstr, "ab", doc, batch_size=2,
                                 hybrid=hybrid, negate=negate)
        assert ok, (rstr, doc, negate, hybrid)

        # artifact tamper: flip one byte mid-proof; the verifier must
        # reject cleanly (False or a typed error), never accept
        blob = bytearray(SZ.dumps("proof", proofs))
        blob[len(blob) // 2] ^= 0x41
        try:
            bad = SZ.loads(bytes(blob), "proof")
        except Exception:
            ran += 1
            continue                       # codec rejected: fine
        import reef_tpu.backend.framework as FW2
        safa2 = SAFA("ab", R.simpl(parser.parse(rstr)))
        if negate:
            safa2 = safa2.negate()
        try:
            ok_bad = FW2.run_verifier(commit, safa2, bad, batch_size=2,
                                      hybrid=hybrid)
        except Exception:
            ok_bad = False                 # clean typed rejection
        assert not ok_bad, (rstr, doc, "tampered proof accepted")
        ran += 1
    assert ran >= 4


def test_random_snark_e2e_fuzz_proj_merkle():
    """Projection- and merkle-mode variants of the full-SNARK fuzz:
    skip-prefixed random tails (the ignorable-prefix shape projections
    need) and merkle-mode commitments, through prove + verify."""
    import random
    import re as pyre

    from reef_tpu.frontend import parser
    from reef_tpu.frontend import regex as R
    from reef_tpu.frontend.safa import SAFA

    rng = random.Random(60606)

    def gen(depth):
        if depth == 0:
            return rng.choice(["a", "b", "[ab]"])
        p = rng.random()
        if p < 0.4:
            return gen(depth - 1) + gen(depth - 1)
        if p < 0.7:
            return "(" + gen(depth - 1) + "|" + gen(depth - 1) + ")"
        return gen(depth - 1)

    ran_proj = ran_merkle = 0
    trial = 0
    while (ran_proj < 2 or ran_merkle < 2) and trial < 200:
        trial += 1
        tail = gen(2)
        skip = rng.randrange(4, 40)
        rstr = f"^.{{{skip}}}{tail}$"
        try:
            safa = SAFA("ab", R.simpl(parser.parse(rstr)))
        except NotImplementedError:
            continue
        if safa.num_states() > 40:
            continue
        doc = None
        for _ in range(40):
            t = "".join(rng.choice("ab") for _ in range(len(tail)))
            cand = "".join(rng.choice("ab") for _ in range(skip)) + t
            if pyre.fullmatch(rstr[1:-1], cand):
                doc = cand
                break
        if doc is None:
            continue
        if ran_proj < 2:
            _, _, ok = e2e(rstr, "ab", doc, batch_size=2, projections=True)
            assert ok, ("proj", rstr, doc)
            ran_proj += 1
        else:
            _, _, ok = e2e(rstr, "ab", doc, batch_size=2, merkle=True)
            assert ok, ("merkle", rstr, doc)
            ran_merkle += 1
    assert ran_proj >= 2 and ran_merkle >= 2
