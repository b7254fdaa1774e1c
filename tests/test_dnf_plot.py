"""Antimirov derivatives (DNF) + SAFA dot export."""

import os
import tempfile

from reef_tpu.frontend import parser, regex as R
from reef_tpu.frontend.dnf import OrSet, aderiv
from reef_tpu.frontend.safa import SAFA, write_dot


def test_aderiv_matches_brzozowski_nullability():
    # flattened Antimirov derivative accepts the same strings as the
    # Brzozowski derivative on a test corpus
    for rstr, doc in [("^ab*c$", "abbc"), ("^(a|b)+c$", "abac"),
                      ("^a{2,3}b$", "aab")]:
        r = R.simpl(parser.parse(rstr))
        for c in map(ord, doc):
            brz = R.deriv(r, c)
            ant = aderiv(r, c).flatten()
            # compare acceptance on the rest of the doc (semantic check)
            for rest in ["", "a", "ab", "bc", "bbc", "ac", "b"]:
                cur_b, cur_a = brz, ant
                for rc in map(ord, rest):
                    cur_b = R.deriv(cur_b, rc)
                    cur_a = R.deriv(cur_a, rc)
                assert R.nullable(cur_b) == R.nullable(cur_a), (rstr, c, rest)
            r = brz


def test_orset_algebra():
    a = OrSet.single(R.character("a"))
    b = OrSet.single(R.character("b"))
    assert len(a.or_(b).sets) == 2
    assert len(a.and_(b).sets) == 1
    assert a.or_(a) == a


def test_write_dot():
    r = R.simpl(parser.parse("^ab$"))
    safa = SAFA("ab", r)
    with tempfile.TemporaryDirectory() as d:
        out = write_dot(safa, os.path.join(d, "g"))
        assert os.path.exists(out)
        data = open(os.path.join(d, "g.dot")).read()
        assert "digraph safa" in data and "->" in data
