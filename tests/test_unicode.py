"""Full-unicode alphabet: derivative classes, SAFA solve, e2e SNARK.

The reference's utf8 config nominally covers all of unicode
(config.rs:253-263) but its per-char derivative edges cannot enumerate
0x110000 codepoints.  Here consuming edges are range-compressed derivative
CLASSES (regex.deriv_classes), table rows carry (char_lo, char_hi)
codepoint ranges, and the step circuit range-checks the doc char against
the looked-up row's range (backend/step_circuit.py).
"""

import random
import re as pyre

import pytest

from reef_tpu.frontend import parser, regex as R
from reef_tpu.frontend.safa import SAFA


def simpl(s: str) -> R.Regex:
    return R.simpl(parser.parse(s))


# ---------------------------------------------------------------------------
# derivative classes
# ---------------------------------------------------------------------------

CLASS_REGEXES = [
    "^ab$", "a.*b", "^[a-f]+[0-9]?$", "^(café|na[ïi]ve)$",
    "^[一-鿿]+$", "^a[^b]c$", "^(?=a.*)a.*b$", "^.{3}x$",
]


@pytest.mark.parametrize("rstr", CLASS_REGEXES)
def test_deriv_classes_partition(rstr):
    """The class partition tiles [0, MAX_CODEPOINT] exactly and every
    sampled char in a cell derives to that cell's (interned) derivative."""
    r = simpl(rstr)
    cells = R.deriv_classes(r)
    assert cells[0][0] == 0
    assert cells[-1][1] == R.MAX_CODEPOINT
    for (_, h1, _), (l2, _, _) in zip(cells, cells[1:]):
        assert l2 == h1 + 1
    rng = random.Random(5)
    for lo, hi, d in cells:
        samples = {lo, hi, rng.randrange(lo, hi + 1)}
        for c in samples:
            assert R.deriv(r, c) is d, (rstr, hex(c))


def test_deriv_classes_merge_adjacent():
    # '.' has a single derivative class covering everything
    cells = R.deriv_classes(simpl("^.$"))
    assert len(cells) == 1 or all(c[2] is cells[0][2] for c in cells) is False


# ---------------------------------------------------------------------------
# full-unicode SAFA solve vs python-re oracle
# ---------------------------------------------------------------------------

SOLVE_CASES = [
    ("café.*界", "naïve café 世界", True),
    ("café.*界", "naive cafe x", False),
    ("^[一-鿿]{2}$", "世界", True),
    ("^[一-鿿]{2}$", "ab", False),
    ("^a[^b]c$", "aéc", True),
    ("^a[^b]c$", "abc", False),
    ("^(?=.*é).*café$", "un café", True),
]


@pytest.mark.parametrize("rstr,doc,expect", SOLVE_CASES)
def test_unicode_solve_vs_python_re(rstr, doc, expect):
    safa = SAFA(None, simpl(rstr))
    codes = [ord(c) for c in doc]
    trace = safa.solve(codes)
    assert (pyre.search(rstr, doc) is not None) == expect
    if expect:
        assert trace is not None, (rstr, doc)
    else:
        assert trace is None, (rstr, doc)


def test_unicode_negate_solve():
    safa = SAFA(None, simpl("^ab$")).negate()
    assert safa.solve([ord(c) for c in "a世"]) is not None
    assert safa.solve([ord(c) for c in "ab"]) is None


def test_unicode_edges_are_ranges():
    """No per-char enumeration: edge counts stay tiny for unicode."""
    safa = SAFA(None, simpl("^[一-鿿]+x$"))
    n_edges = sum(len(e) for e in safa.out_edges)
    assert n_edges < 100
    kinds = {lbl[0] for es in safa.out_edges for _, lbl in es}
    assert "r" in kinds and "c" not in kinds


# ---------------------------------------------------------------------------
# e2e SNARK over the unicode alphabet
# ---------------------------------------------------------------------------


def _e2e(rstr, doc, negate=False, **kw):
    from reef_tpu.backend import framework as FW

    safa = SAFA(None, simpl(rstr))
    if negate:
        safa = safa.negate()
    codes = [ord(c) for c in doc]
    merkle = kw.get("merkle", False)
    commit, dc_secret = FW.run_committer(codes, safa.ab, merkle, seed=7)
    proofs = FW.run_prover(commit, dc_secret, safa, codes, batch_size=2,
                           **kw)
    return FW.run_verifier(commit, safa, proofs, batch_size=2, **kw)


@pytest.mark.e2e
@pytest.mark.parametrize("rstr,doc,negate", [
    ("café.*界", "naïve café 世界", False),
    ("^ab$", "a世", True),
])
def test_unicode_e2e(rstr, doc, negate):
    assert _e2e(rstr, doc, negate=negate)


@pytest.mark.e2e
def test_unicode_e2e_hybrid():
    assert _e2e("café.*界", "naïve café 世界", hybrid=True)


@pytest.mark.e2e
def test_unicode_e2e_merkle():
    assert _e2e("café.*界", "naïve café 世界", merkle=True)


@pytest.mark.e2e
def test_unicode_e2e_projections():
    assert _e2e("^.{8}世界", "aaaaaaaa世界", projections=True)


@pytest.mark.e2e
@pytest.mark.slow
def test_unicode_e2e_multikb_merkle_negate():
    """BASELINE config 5 shape at multi-KB scale: utf8 --merkle --negate
    on a multi-script doc (the 100 KB+ runs live in workloads/run.py
    unicode_mn/unicode_proj; this keeps a CI-sized guard in the lane)."""
    unit = "naïve café — 世界🌍: ab "
    doc = unit * 180 + "终端OK"                    # ~4 KB of utf8 bytes
    n = len(doc)
    assert _e2e(f"^.{{{n - 6}}}禁🛑MARK.*", doc, negate=True, merkle=True)
