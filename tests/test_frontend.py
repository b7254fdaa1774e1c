"""Frontend tests: OpenSet algebra, regex parsing/derivatives, SAFA solver.

Strategy mirrors the reference's (SURVEY.md §4): pure-logic unit tests for
OpenSet/regex, then the SAFA solver exercised as an oracle over a corpus —
here cross-checked against Python's `re` engine, which agrees with Reef's
top-level anchor semantics (unanchored patterns match anywhere, i.e.
re.search).  Reference corpus: safa.rs:529-988 (passwords, ranges, forks,
negation, projections).
"""

import re as pyre

import pytest

from reef_tpu.frontend import parser, regex as R
from reef_tpu.frontend.openset import OpenSet
from reef_tpu.frontend.safa import SAFA


# ---------------------------------------------------------------------------
# OpenSet
# ---------------------------------------------------------------------------

class TestOpenSet:
    def test_normalize_merge(self):
        s = OpenSet([(0, 3), (4, 6), (10, 12)])
        assert s.ranges == ((0, 6), (10, 12))

    def test_union_intersect(self):
        a = OpenSet([(0, 5)])
        b = OpenSet([(3, None)])
        assert a.union(b).ranges == ((0, None),)
        assert a.intersection(b).ranges == ((3, 5),)

    def test_negate(self):
        s = OpenSet([(2, 4), (8, None)])
        assert s.negate().ranges == ((0, 1), (5, 7))
        assert OpenSet.star().negate().is_empty()
        assert OpenSet.empty().negate().ranges == ((0, None),)
        # involution on closed sets within a bounded check
        t = OpenSet([(1, 3), (7, 9)])
        assert t.negate().negate() == t

    def test_contains_iter(self):
        s = OpenSet([(1, 3), (9, None)])
        assert all(s.contains(v) for v in (1, 2, 3, 9, 100))
        assert not any(s.contains(v) for v in (0, 4, 8))
        assert list(s.iter_bounded(11)) == [1, 2, 3, 9, 10, 11]

    def test_usize_arithmetic(self):
        # {1}.app({2,3}) = {3,4}
        a = OpenSet.single(1)
        b = OpenSet([(2, 3)])
        assert a.app(b).ranges == ((3, 4),)
        # repeat: {1}{2,4} = {2,3,4} -- wait: {1}.times(2)={2} union ... = {2,3,4}
        assert OpenSet.single(1).repeat(2, 4).ranges == ((2, 4),)
        assert OpenSet.star().kleene() == OpenSet.star()
        assert OpenSet.nil().kleene() == OpenSet.nil()

    def test_repeat_open(self):
        s = OpenSet([(2, None)])
        assert s.times(2).ranges == ((4, None),)


# ---------------------------------------------------------------------------
# regex parsing + simplification
# ---------------------------------------------------------------------------

def simpl(s: str) -> R.Regex:
    return R.simpl(parser.parse(s))


class TestRegexParse:
    def test_anchors(self):
        # ^a$ -> a  (parser.rs tests 117-127)
        assert simpl("^a$") is R.character("a")
        # ^a*$ -> a*
        assert simpl("^a*$") is R.star(R.character("a"))

    def test_unanchored_wraps_dotstar(self):
        r = simpl("a")
        assert r is R.app(R.app(R.dotstar(), R.character("a")), R.dotstar())

    def test_range_and_class(self):
        r = simpl("^[a-c]{2}$")
        assert r.tag == R.RANGE and r.lo == 2 and r.hi == 2
        assert r.a.cc == OpenSet([(ord("a"), ord("c"))])

    def test_negated_class(self):
        r = simpl("^[^a]$")
        assert r.tag == R.CHARCLASS
        assert not r.cc.contains(ord("a"))
        assert r.cc.contains(ord("b"))

    def test_alt_idempotent(self):
        assert simpl("^(a|a)$") is R.character("a")

    def test_lookahead_becomes_and(self):
        r = simpl("^(?=a.*)b$")
        assert r.tag == R.AND

    def test_nullable(self):
        assert R.nullable(simpl("^a*$"))
        assert not R.nullable(simpl("^a+$"))
        assert R.nullable(simpl("^(a|)$"))

    def test_deriv(self):
        r = simpl("^ab$")
        d = R.deriv(r, ord("a"))
        assert d is R.character("b")
        assert R.is_empty(R.deriv(r, ord("b")))

    def test_extract_skip(self):
        got = R.extract_skip(simpl("^.{3}b$"))
        assert got is not None
        skip, rem = got
        assert skip == OpenSet.single(3)
        assert rem is R.character("b")
        # .* prefix
        skip2, rem2 = R.extract_skip(simpl("b"))
        assert skip2 == OpenSet.star()

    def test_star_range_collapse(self):
        # r{0,1}* == r*
        assert R.star(R.range_(R.character("a"), 0, 1)) is R.star(R.character("a"))


# ---------------------------------------------------------------------------
# SAFA: build + solve, oracle = python re
# ---------------------------------------------------------------------------

def check_trace(safa: SAFA, trace, doc):
    """Structural validity of a solver trace."""
    for el in trace:
        assert (el.to_node, el.edge) in [
            (d, l) for d, l in safa.out_edges[el.from_node]
        ], f"edge not in graph: {el}"
        if el.is_char:
            assert doc[el.from_cur] == el.edge[1]
            assert el.to_cur == el.from_cur + 1
        else:
            assert el.edge[1].contains(el.to_cur - el.from_cur)
    if trace:
        assert trace[-1].to_cur <= len(doc)


CORPUS = [
    # (regex, doc, alphabet)
    ("^baa$", "baa", "ab"),
    ("^baa$", "bab", "ab"),
    ("baa", "ababbbaa", "ab"),
    ("baa", "ababbbab", "ab"),
    ("^a*$", "aa", "ab"),
    ("^a*$", "ab", "ab"),
    ("baa(a|c)$", "abababaac", "abc"),
    ("^.*baa(a|b)$", "abababaab", "ab"),
    ("^.{3}b$", "aaab", "ab"),
    ("^.{3}b$", "aab", "ab"),
    ("^.{1,3}b$", "aaab", "ab"),
    ("^.{2,}b$", "aaab", "ab"),
    ("^(a|ab)c$", "abc", "abc"),
    ("^(a|ab)c$", "ac", "abc"),
    ("(?=a.*).*b$", "aab", "ab"),
    ("(?=a.*).*b$", "bb", "ab"),
    ("^(?=a)ab$", "ab", "ab"),
    ("^(?=b)ab$", "ab", "ab"),
    ("^a.{4}b$", "axxxxb", "abx"),
    ("^[a-c]+$", "abcabc", "abcd"),
    ("^[a-c]+$", "abcd", "abcd"),
    ("hello.*", "hello world", "helo wrd"),
    ("hello.*", "hell world", "helo wrd"),
    # password-policy style stacked lookaheads (safa.rs:871-911)
    ("^(?=.*[A-Z].*[A-Z])(?=.*[a-z]).{6}$", "AAbbbb", "AaBbZz"),
    ("^(?=.*[A-Z].*[A-Z])(?=.*[a-z]).{6}$", "Aabbbb", "AaBbZz"),
    # DNA-style giant skip (safa.rs:953-967)
    ("^.{8}ACGT", "AAAAAAAAACGTAAAA", "ACGT"),
    ("^.{8}ACGT", "AAAAAAAACGTAAAAA", "ACGT"),
    # pi-hole ad-block style URI fragments (safa.rs:914-937)
    (".*ad[sx]?[.]doubleclick[.].*", "www.adx.doubleclick.net",
     "adsxoubleickwnt."),
    (".*ad[sx]?[.]doubleclick[.].*", "www.doubleclick.net",
     "adsxoubleickwnt."),
    # PII/SSN-shape digits with separators (safa.rs:940-950)
    ("^[0-9]{3}-[0-9]{2}-[0-9]{4}$", "123-45-6789", "0123456789-"),
    ("^[0-9]{3}-[0-9]{2}-[0-9]{4}$", "123-456-789", "0123456789-"),
    # date-like bounded ranges
    ("^[0-9]{1,2}/[0-9]{1,2}$", "3/14", "0123456789/"),
    ("^[0-9]{1,2}/[0-9]{1,2}$", "314", "0123456789/"),
    # alternation branches converging on a shared suffix (the DAG
    # cross-edge case for the consuming-cycle detector)
    ("^(ab|cb)b$", "abb", "abc"),
    ("^(ab|cb)b$", "cbb", "abc"),
    ("^(ab|cb)b$", "bbb", "abc"),
    # nested lookahead under alternation
    ("^((?=a.)ab|ba)$", "ab", "ab"),
    ("^((?=b.)ab|ba)$", "ab", "ab"),
    # bounded counted repeat of a class
    ("^[ab]{2,4}c$", "abac", "abc"),
    ("^[ab]{2,4}c$", "ababac", "abc"),
    # double skip composition
    ("^.{2}a.{2}b$", "xxaxxb", "abx"),
    ("^.{2}a.{2}b$", "xxaxb", "abx"),
]


@pytest.mark.parametrize("rstr,doc,ab", CORPUS, ids=[f"{r}~{d}" for r, d, ab in CORPUS])
def test_solver_vs_python_re(rstr, doc, ab):
    r = R.simpl(parser.parse(rstr))
    safa = SAFA(ab, r)
    got = safa.solve([ord(c) for c in doc])
    want = pyre.search(rstr, doc) is not None
    assert (got is not None) == want, f"solver={got is not None} re={want}"
    if got is not None:
        check_trace(safa, got, [ord(c) for c in doc])


def test_skip_edge_shape():
    # ^.{3}b$ should have a single skip edge {3} from the root
    r = R.simpl(parser.parse("^.{3}b$"))
    safa = SAFA("ab", r)
    skips = [lbl[1] for dst, lbl in safa.out_edges[0] if lbl[0] == "s"
             and not lbl[1].is_nil()]
    assert OpenSet.single(3) in skips
    # and its complement to the sink
    assert OpenSet.single(3).negate() in skips


def test_forall_fanout():
    r = R.simpl(parser.parse("^(?=a)(?=b)(?=c)$"))
    safa = SAFA("ab", r)
    assert safa.max_forall_fanout() == 4


def test_negate_flips_acceptance():
    r = R.simpl(parser.parse("^ab$"))
    safa = SAFA("ab", r)
    neg = safa.negate()
    doc = [ord("a"), ord("b")]
    assert safa.solve(doc) is not None
    assert neg.solve(doc) is None
    doc2 = [ord("a"), ord("a")]
    assert safa.solve(doc2) is None
    assert neg.solve(doc2) is not None


def test_projection():
    # projection ^.{4,15}a$ -> 4 ; unanchored -> None
    r = R.simpl(parser.parse("^.{4,15}a$"))
    assert SAFA("a", r).projection() == 4
    r2 = R.simpl(parser.parse("a"))
    assert SAFA("a", r2).projection() is None


def test_large_doc_skip_solve():
    # giant-skip solve must be fast (cursor jumps, not per-char states)
    n = 50000
    doc = [ord("A")] * n + [ord(c) for c in "CGTA"]
    r = R.simpl(parser.parse(f"^.{{{n}}}CGTA$"))
    safa = SAFA("ACGT", r)
    got = safa.solve(doc)
    assert got is not None
    assert any(e.is_skip and e.to_cur - e.from_cur == n for e in got)


def _gen_regex(rng, depth):
    """Random small regex over {a,b} valid for both python-re and the
    frontend parser."""
    if depth == 0:
        return rng.choice(["a", "b", "[ab]", "[a]", "."])
    r = rng.random()
    if r < 0.3:
        return _gen_regex(rng, depth - 1) + _gen_regex(rng, depth - 1)
    if r < 0.5:
        return ("(" + _gen_regex(rng, depth - 1) + "|"
                + _gen_regex(rng, depth - 1) + ")")
    if r < 0.65:
        return "(" + _gen_regex(rng, depth - 1) + ")*"
    if r < 0.8:
        return "(" + _gen_regex(rng, depth - 1) + ")?"
    if r < 0.9:
        lo = rng.randrange(0, 3)
        hi = lo + rng.randrange(0, 3)
        return "(" + _gen_regex(rng, depth - 1) + "){%d,%d}" % (lo, hi)
    return _gen_regex(rng, depth - 1)


def test_random_regex_fuzz_vs_python_re():
    """Seeded random regex/doc fuzz against the python-re oracle — an
    ACTIVE version of the reference's dormant cfg(fuzz) scaffold
    (arbitrary.rs).  Match/non-match must agree and every produced trace
    must replay."""
    import random
    rng = random.Random(20260817)
    checked = 0
    for trial in range(150):
        rstr = "^" + _gen_regex(rng, 3) + "$"
        try:
            pyre.compile(rstr)
            r = R.simpl(parser.parse(rstr))
            safa = SAFA("ab", r)
        except Exception:
            continue                      # unsupported corner; skip
        if safa.num_states() > 150:
            continue
        for _ in range(4):
            doc = "".join(rng.choice("ab")
                          for _ in range(rng.randrange(0, 8)))
            if not doc:
                continue                  # empty docs unsupported by design
            want = pyre.search(rstr, doc) is not None
            got = safa.solve([ord(c) for c in doc])
            assert (got is not None) == want, (rstr, doc)
            if got is not None:
                check_trace(safa, got, [ord(c) for c in doc])
            checked += 1
    assert checked > 200, f"fuzz only exercised {checked} cases"


def test_random_negation_fuzz_vs_python_re():
    """Negation soundness fuzz: negate() must accept exactly the
    complement (a wrong 'non-match' answer would be a proof-system
    soundness break under -n).  Includes lookaheads."""
    import random
    rng = random.Random(271828)

    def gen(depth, look=True):
        if depth == 0:
            return rng.choice(["a", "b", "[ab]", "."])
        r = rng.random()
        if r < 0.3:
            return gen(depth - 1, look) + gen(depth - 1, False)
        if r < 0.55:
            return "(" + gen(depth - 1, False) + "|" + gen(depth - 1, False) + ")"
        if r < 0.7:
            return "(" + gen(depth - 1, False) + ")*"
        if r < 0.8:
            return "(" + gen(depth - 1, False) + ")?"
        if r < 0.9 and look:
            return "(?=" + gen(depth - 1, False) + ")" + gen(depth - 1, False)
        return gen(depth - 1, look)

    checked = 0
    for trial in range(60):
        rstr = "^" + gen(rng.choice([2, 3])) + "$"
        try:
            pyre.compile(rstr)
            r = R.simpl(parser.parse(rstr))
            safa = SAFA("ab", r)
            neg = safa.negate()
        except NotImplementedError:
            continue
        if safa.num_states() > 150 or neg.num_states() > 300:
            continue
        for _ in range(4):
            doc = "".join(rng.choice("ab")
                          for _ in range(rng.randrange(1, 7)))
            want = pyre.search(rstr, doc) is not None
            got = safa.solve([ord(c) for c in doc])
            assert (got is not None) == want, (rstr, doc)
            ngot = neg.solve([ord(c) for c in doc])
            assert (ngot is not None) == (not want), ("negate", rstr, doc)
            checked += 1
    assert checked > 100, f"negation fuzz only exercised {checked} cases"


def test_double_negation_language():
    """negate(negate(s)) accepts the original language (the reference's
    double-negation tests are #[ignore]d; ours run)."""
    for rstr, docs in (("^a(b|a)*$", ["a", "ab", "aba", "b", "ba"]),
                       ("^(?=a.*)..$", ["ab", "ba", "aa"])):
        r = R.simpl(parser.parse(rstr))
        safa = SAFA("ab", r)
        nn = safa.negate().negate()
        for doc in docs:
            codes = [ord(c) for c in doc]
            assert (safa.solve(codes) is not None) == \
                (nn.solve(codes) is not None), (rstr, doc)
