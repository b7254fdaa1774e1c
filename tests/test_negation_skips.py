"""Sound-negation skip coverage (VERDICT r2 #6).

The dual automaton keeps three skip classes without re-linearizing:
  - deterministic single-offset skips `.{k}` (self-dual forced jumps);
  - NEW: bounded ranges `.{a,b}` as dual AND-forks over singleton-offset
    children (safa._dual_range_fork);
  - NEW: empty-language states jump straight to EOF (the complement
    accepts every suffix; an early mismatch under `-n` was linear in the
    document tail otherwise).
Star skips stay derivative-walked: their complement quantifies over every
remaining offset, which is inherently linear.
"""

import random
import re as pyre

import pytest

from reef_tpu.frontend import parser, regex as R
from reef_tpu.frontend.safa import SAFA


def _neg(ab: str, rs: str) -> SAFA:
    return SAFA(ab, R.simpl(parser.parse(rs))).negate()


def _codes(doc: str):
    return [ord(c) for c in doc]


def test_dual_empty_state_jumps_to_eof():
    """An early mismatch makes the original derivative the empty language;
    the complement then accepts the whole remaining suffix in ONE skip
    trace element instead of walking it."""
    safa_n = _neg("abx", "^abc")
    doc = "x" + "a" * 5000
    tr = safa_n.solve(_codes(doc), native=False)
    assert tr is not None
    assert len(tr) < 12, f"EOF jump missing: trace length {len(tr)}"


def test_dual_single_offset_skip_trace_constant():
    """`^.{k}MOTIF.*` negated: the deterministic skip survives, so the
    non-match witness is O(|MOTIF|), independent of k."""
    k = 4000
    safa_n = _neg("ACGT", f"^.{{{k}}}TTTT.*")
    doc = "A" * (k + 50)
    tr = safa_n.solve(_codes(doc), native=False)
    assert tr is not None
    assert len(tr) < 20, len(tr)


def test_dual_bounded_range_skip_trace_short():
    """`^.{a,b}MOTIF.*` negated: the bounded range dualizes as an AND-fork
    over b-a+1 deterministic jumps — witness size O((b-a+1)*|MOTIF|), not
    O(doc)."""
    safa_n = _neg("ACGT", "^.{3000,3003}TTTT.*")
    doc = "A" * 3600
    tr = safa_n.solve(_codes(doc), native=False)
    assert tr is not None
    assert len(tr) < 60, len(tr)


@pytest.mark.parametrize("rs", [
    ".{2,5}ab", "^.{1,3}b$", "a.{0,2}b", "^(?:a|.{2,4}b)$",
    ".{3,6}(?:a|bb)", "^.{2,3}$",
])
def test_dual_range_fork_oracle_exhaustive(rs):
    """Negated range-skip regexes agree with the python-re complement on
    every doc up to length 8 (exhaustive over {a,b})."""
    safa_n = _neg("ab", rs)
    crx = pyre.compile(rs)
    for n in range(0, 9):
        for i in range(2 ** n):
            doc = "".join("ab"[(i >> j) & 1] for j in range(n))
            want_neg = crx.search(doc) is None
            got = safa_n.solve(_codes(doc), native=False) is not None
            assert got == want_neg, (rs, doc)


def test_double_negation_roundtrip():
    """negate(negate(r)) accepts exactly what r accepts (the reference's
    #[ignore]d double-negation tests, safa.rs:787-840)."""
    rng = random.Random(3)
    for rs in (".{2,4}ab", "^a*b$", "a|b.{1,3}a"):
        safa = SAFA("ab", R.simpl(parser.parse(rs)))
        safa_nn = safa.negate().negate()
        for _ in range(40):
            doc = "".join(rng.choice("ab")
                          for _ in range(rng.randrange(0, 10)))
            a = safa.solve(_codes(doc), native=False) is not None
            b = safa_nn.solve(_codes(doc), native=False) is not None
            assert a == b, (rs, doc)


@pytest.mark.slow
def test_negation_fuzz_vs_python_re():
    """Seeded random regexes (concats, alternations, stars, counted
    repeats, range skips) negated and checked against the python-re
    complement on random docs.  The standalone 888-case burn ran clean;
    this keeps a 240-case slice in the lane."""
    rng = random.Random(12345)

    def rand_regex(depth=3):
        if depth == 0:
            return rng.choice(["a", "b", "."])
        c = rng.randrange(7)
        d = depth - 1
        if c == 0:
            return rand_regex(d) + rand_regex(d)
        if c == 1:
            return f"(?:{rand_regex(d)})|(?:{rand_regex(d)})"
        if c == 2:
            return f"(?:{rand_regex(d)})*"
        if c == 3:
            return (f"(?:{rand_regex(d)})"
                    f"{{{rng.randrange(1, 4)},{rng.randrange(4, 7)}}}")
        if c == 4:
            return (f".{{{rng.randrange(1, 5)},{rng.randrange(5, 9)}}}"
                    + rand_regex(d))
        if c == 5:
            return f".{{{rng.randrange(1, 6)}}}" + rand_regex(d)
        return rand_regex(d)

    total = 0
    for _ in range(40):
        rs = rand_regex()
        try:
            safa_n = _neg("ab", rs)
            crx = pyre.compile(rs)
        except Exception:
            continue
        for _ in range(6):
            doc = "".join(rng.choice("ab")
                          for _ in range(rng.randrange(0, 11)))
            want_neg = crx.search(doc) is None
            got = safa_n.solve(_codes(doc), native=False) is not None
            assert got == want_neg, (rs, doc)
            total += 1
    assert total >= 150, total


@pytest.mark.slow
def test_negated_dna_200kb_within_3x_of_positive():
    """The headline `-n` scaling check (VERDICT r2 #6 Done criterion,
    200KB in-process flavor; BENCHMARKS.md records the 1MB CLI numbers):
    proving the NON-match of the DNA motif regex must cost within 3x of
    proving the match — both are 1-fold skip traces."""
    import time
    from reef_tpu.backend import framework as FW

    n = 200_000
    motif = "ATGGGCTACAGAAACCGTGCCAAA"
    rng = random.Random(42)
    body = "".join(rng.choice("ACGT") for _ in range(n - len(motif)))
    regex = f"^.{{{n - len(motif)}}}{motif}.*"
    r = R.simpl(parser.parse(regex))

    def run(safa, doc):
        codes = _codes(doc)
        t0 = time.time()
        commit, dc = FW.run_committer(codes, safa.ab, False, seed=9)
        proofs = FW.run_prover(commit, dc, safa, codes, batch_size=0)
        assert FW.run_verifier(commit, safa, proofs, batch_size=0)
        return time.time() - t0, proofs.ivc.n_steps

    t_pos, folds_pos = run(SAFA("ACGT", r), body + motif)
    t_neg, folds_neg = run(SAFA("ACGT", r).negate(),
                           body + "A" * len(motif))
    assert folds_neg <= folds_pos + 1, (folds_neg, folds_pos)
    assert t_neg <= 3 * t_pos + 5, (t_neg, t_pos)
