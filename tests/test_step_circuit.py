"""Constraint-satisfaction integration tests (the reference's workhorse gate,
`test_func_no_hash` r1cs.rs:2580-2735): regex+doc -> table -> circuit ->
per-batch witnesses; assert every R1CS row satisfied, z chains across batches,
and the final clear checks hold (stack empty, exit state, running claims equal
table/doc MLE evaluations)."""

import pytest

from reef_tpu.backend import sumcheck as SC
from reef_tpu.backend.step_circuit import StepCircuit
from reef_tpu.backend.table import TransitionTable, doc_transform
from reef_tpu.backend.witness import solve_and_batch
from reef_tpu.frontend import parser, regex as R
from reef_tpu.frontend.safa import SAFA
from reef_tpu.ops import field as F

f = F.FQ
SALT = 0x5A17
DOC_HASH = 0xD0C4A54


def run_case(rstr, ab, doc, batch_size=2, hybrid=False, merkle=False,
             projections=False, negate=False):
    r = R.simpl(parser.parse(rstr))
    safa = SAFA(ab, r)
    if negate:
        safa = safa.negate()
    codes = [ord(c) for c in doc]
    udoc = doc_transform(safa.ab, codes)
    proj = safa.projection() if projections else None
    tt = TransitionTable(safa, udoc, len(udoc), len(codes),
                         batch_size=batch_size, projection=proj,
                         hybrid=hybrid, merkle=merkle)
    circuit = StepCircuit(tt, DOC_HASH)

    z = None
    n_batches = 0
    last_res = None
    final_wits = None
    for wits, res in solve_and_batch(tt, circuit, codes, DOC_HASH, SALT):
        vec = circuit.compiled.witness(wits)
        bad = circuit.compiled.check_all(vec)
        assert bad is None, (
            f"constraint {bad} failed on batch {n_batches}: "
            f"{circuit.cs.constraints[bad]}")
        outs = circuit.compiled.outputs(vec)
        if z is not None:
            # input side of this batch must equal last batch's outputs
            zin = [wits[name] for name in circuit.z_in_names]
            assert zin == z, f"z chain broken at batch {n_batches}"
        z = outs
        n_batches += 1
        last_res = res
        final_wits = wits

    # final checks (commitment.rs final_clear_checks + framework.rs:870)
    assert last_res.next_state == tt.exit_state
    assert last_res.sp_out == 0
    assert z[0] == tt.exit_state
    if not hybrid:
        nl_q = last_res.nl_next_q
        nl_v = last_res.nl_next_v
        assert SC.verifier_mle_eval(f, tt.table, nl_q) == nl_v
    if not hybrid and not merkle:
        doc_q = last_res.doc_next_q
        doc_v = last_res.doc_next_v
        proj_doc = (udoc[tt.doc_subset[0]:tt.doc_subset[1]]
                    if tt.doc_subset else udoc)
        assert SC.verifier_mle_eval(f, proj_doc, doc_q) == doc_v
    return tt, circuit, n_batches


def test_simplest_e2e_slice():
    # the reference's own smoke case: '.*b' over aaaaaaaab (README.md:61-67)
    tt, circ, nb = run_case(".*b", "ab", "aaaaaaaab", batch_size=2)
    assert nb >= 1


def test_exact_match():
    run_case("^baa$", "ab", "baa", batch_size=2)


def test_batch_sizes():
    for bs in (2, 3, 4, 7):
        run_case("^baa$", "ab", "baa", batch_size=bs)


def test_skip_range():
    run_case("^.{3}b$", "ab", "aaab", batch_size=2)
    run_case("^.{1,3}b$", "ab", "aaab", batch_size=3)


def test_star_skip():
    run_case("hello.*", "helo wrd", "hello world", batch_size=3)


def test_alternation():
    run_case("^(a|ab)c$", "abc", "abc", batch_size=2)


def test_forall_lookahead():
    # forall fork with stack push/pop
    run_case("^(?=a.*).*b$", "ab", "aab", batch_size=2)


def test_forall_multi():
    run_case("^(?=.*a)(?=.*b).*$", "ab", "ab", batch_size=2)


def test_negate():
    run_case("^ab$", "ab", "aa", negate=True, batch_size=2)


def test_projections():
    tt, _, _ = run_case("^.{36}ACGT$", "ACGT", "A" * 36 + "ACGT",
                        projections=True, batch_size=2)
    assert tt.doc_subset is not None  # projection actually engaged


def test_projection_degenerate_falls_back():
    # chunking can't help here (chunk would exclude the EOF/EPS sentinels):
    # must fall back to no projection rather than produce bad accesses
    tt, _, _ = run_case("^.{12}ACGT$", "ACGT", "A" * 12 + "ACGT",
                        projections=True, batch_size=2)
    assert tt.doc_subset is None


def test_hybrid():
    run_case("^baa$", "ab", "baa", hybrid=True, batch_size=2)


def test_weird_batch_size():
    # batch larger than the trace
    run_case("^ab$", "ab", "ab", batch_size=5)


def test_solver_failure_raises():
    r = R.simpl(parser.parse("^ab$"))
    safa = SAFA("ab", r)
    codes = [ord(c) for c in "aa"]
    udoc = doc_transform(safa.ab, codes)
    tt = TransitionTable(safa, udoc, len(udoc), len(codes), batch_size=2)
    circuit = StepCircuit(tt, DOC_HASH)
    with pytest.raises(ValueError, match="No solution"):
        list(solve_and_batch(tt, circuit, codes, DOC_HASH, SALT))


def test_bad_witness_rejected():
    """Tampering with a lookup value must break a constraint."""
    r = R.simpl(parser.parse("^baa$"))
    safa = SAFA("ab", r)
    codes = [ord(c) for c in "baa"]
    udoc = doc_transform(safa.ab, codes)
    tt = TransitionTable(safa, udoc, len(udoc), len(codes), batch_size=2)
    circuit = StepCircuit(tt, DOC_HASH)
    gen = solve_and_batch(tt, circuit, codes, DOC_HASH, SALT)
    wits, _ = next(gen)
    wits["char_0"] = (wits["char_0"] + 1) % f.p  # lie about the char
    vec = circuit.compiled.witness(wits)
    assert circuit.compiled.check_all(vec) is not None


def test_random_circuit_fuzz():
    """Randomized version of the workhorse gate: random regex/doc pairs
    (incl. lookaheads and negation) through table -> circuit -> witness
    -> check_all -> final clear checks.  Seeded and bounded."""
    import random
    import re as pyre
    rng = random.Random(424242)

    def gen(depth, look=True):
        if depth == 0:
            return rng.choice(["a", "b", "[ab]", "."])
        p = rng.random()
        if p < 0.3:
            return gen(depth - 1, look) + gen(depth - 1, False)
        if p < 0.55:
            return "(" + gen(depth - 1, False) + "|" + gen(depth - 1, False) + ")"
        if p < 0.68:
            return "(" + gen(depth - 1, False) + ")*"
        if p < 0.78:
            return "(" + gen(depth - 1, False) + ")?"
        if p < 0.88 and look:
            return "(?=" + gen(depth - 1, False) + ")" + gen(depth - 1, False)
        return gen(depth - 1, look)

    ran = 0
    trial = 0
    while ran < 12 and trial < 400:
        trial += 1
        rstr = "^" + gen(rng.choice([2, 3])) + "$"
        negate = rng.random() < 0.3
        try:
            r = R.simpl(parser.parse(rstr))
            safa = SAFA("ab", r)
        except NotImplementedError:
            continue
        if negate:
            safa = safa.negate()
        if safa.num_states() > 60:
            continue
        # find a doc the (possibly negated) SAFA accepts
        doc = None
        for _ in range(30):
            cand = "".join(rng.choice("ab")
                           for _ in range(rng.randrange(1, 7)))
            want = pyre.search(rstr, cand) is not None
            if want != negate:
                doc = cand
                break
        if doc is None:
            continue
        hybrid = rng.random() < 0.3
        run_case(rstr, "ab", doc, batch_size=rng.choice([2, 3, 4]),
                 negate=negate, hybrid=hybrid)
        ran += 1
    assert ran >= 12


def test_random_circuit_fuzz_projections():
    """Projection mode on skip-prefixed random tails (the ignorable-prefix
    machinery): constraint gate + clear checks."""
    import random
    import re as pyre
    rng = random.Random(98765)
    ran = 0
    trial = 0
    while ran < 6 and trial < 200:
        trial += 1
        tail = "".join(rng.choice("ab") for _ in range(rng.randrange(2, 5)))
        skip = rng.choice([8, 12, 16])
        rstr = f"^.{{{skip}}}{tail}$"
        doc = "".join(rng.choice("ab") for _ in range(skip)) + tail
        if pyre.search(rstr, doc) is None:
            continue
        run_case(rstr, "ab", doc, batch_size=2, projections=True)
        ran += 1
    assert ran >= 6
