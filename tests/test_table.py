"""Transition-table compiler tests: encoding, rel codes, trace coverage."""

import pytest

from reef_tpu.backend import table as T
from reef_tpu.backend.table import TransitionTable, doc_transform, trace_preprocessing
from reef_tpu.frontend import parser, regex as R
from reef_tpu.frontend.safa import SAFA


def build(rstr, ab, doc):
    r = R.simpl(parser.parse(rstr))
    safa = SAFA(ab, r)
    codes = [ord(c) for c in doc]
    udoc = doc_transform(safa.ab, codes)
    return safa, codes, udoc


def test_doc_transform():
    safa, codes, udoc = build("^ab$", "ab", "ab")
    # a=0, b=1, EOF=4, EPSILON=3; padded to 4
    assert udoc == [0, 1, 4, 3]
    assert len(udoc) == 4


def test_table_contains_trace_rows():
    """Every solver-trace step (plus transitions/padding) must be encodable
    as a table row -- the witness generator depends on it."""
    for rstr, ab, doc in [
        ("^baa$", "ab", "baa"),
        ("baa", "ab", "ababbbaa"),
        ("^.{3}b$", "ab", "aaab"),
        ("^(?=a.*)a.*b$", "ab", "aab"),
        ("^(a|ab)c$", "abc", "abc"),
    ]:
        safa, codes, udoc = build(rstr, ab, doc)
        tt = TransitionTable(safa, udoc, len(udoc), len(codes), batch_size=2)
        trace = safa.solve(codes)
        assert trace is not None
        sols = trace_preprocessing(trace)
        # each non-forall trace edge must be in the table with its rel code
        for sol in sols:
            for el in sol:
                s, d = el.from_node, el.to_node
                if safa.nodes[s].is_and and safa.is_fork(s):
                    kids = tt.foralls_w_kids[s]
                else:
                    kids = []
                rel = tt.calc_rel(s, d, kids, False)
                if el.is_char:
                    c = tt.num_ab[el.edge[1]]
                    row = tt.encode(rel, s, d, c, c, 1, 1)
                    assert row in tt.row_index, (rstr, el)
                # skip rows: at least one (lo,hi) window covers the offset
                else:
                    offs = el.to_cur - el.from_cur
                    found = False
                    for lo, hi in tt._skip_rows(el.edge[1]):
                        row = tt.encode(rel, s, d, tt.eps_code, tt.eps_code,
                                        lo, hi)
                        if row in tt.row_index:
                            real_hi = (1 << 62) if hi == tt.star_offset else hi
                            if lo <= offs <= real_hi:
                                found = True
                    assert found, (rstr, el)
        # transition rows: accepting -> exit always present
        for a in safa.accepting:
            row = tt.encode(1, a, tt.exit_state, tt.eof_code, tt.eof_code,
                            0, 0)
            if a in {el.to_node for sol in sols for el in sol} | {0}:
                assert row in tt.row_index
        # exit loop row
        assert tt.encode(0, tt.exit_state, tt.exit_state, tt.eof_code,
                         tt.eof_code, 0, 0) in tt.row_index


def test_power_of_two_padding():
    safa, codes, udoc = build("^ab$", "ab", "ab")
    tt = TransitionTable(safa, udoc, len(udoc), len(codes), batch_size=2)
    n = len(tt.table)
    assert n & (n - 1) == 0
    assert all(v == tt.calc_fill for v in tt.table[len(tt.row_index):]
               if v == tt.calc_fill)


def test_forall_push_rel_encoding():
    safa, codes, udoc = build("^(?=a.*)(?=.*b)a.*b$", "ab", "ab")
    tt = TransitionTable(safa, udoc, len(udoc), len(codes), batch_size=2)
    assert tt.foralls_w_kids, "expected a forall node"
    for forall, kids in tt.foralls_w_kids.items():
        rel0 = tt.calc_rel(forall, kids[0], kids, False)
        assert rel0 >= 4
        # decodable: rel0 - 4 in base num_states gives kids[1..] reversed+pad
        rem = rel0 - 4
        decoded = []
        for _ in range(tt.max_branches):
            rem //= tt.num_states
            decoded.append(rem % tt.num_states)
        expect = list(reversed(kids[1:])) + [tt.kid_padding] * (
            tt.max_branches - len(kids[1:]))
        assert decoded == expect
        for other in kids[1:]:
            assert tt.calc_rel(forall, other, kids, False) == 3


def test_hybrid_table_extension():
    safa, codes, udoc = build("^ab$", "ab", "ab")
    tt = TransitionTable(safa, udoc, len(udoc), len(codes), batch_size=2,
                         hybrid=True)
    assert tt.hybrid_len is not None
    assert tt.hybrid_len == 2 * max(
        T.costs.next_power_of_two(len(codes) + 2),
        T.costs.next_power_of_two(len(tt.row_index)))
    assert len(tt.table) == tt.hybrid_len // 2


def test_projection_chunk():
    # ^.{8}ACGT with a 16-char doc: prefix of 8 provably ignorable
    rstr = "^.{36}ACGT$"
    safa, codes, udoc = build(rstr, "ACGT", "A" * 36 + "ACGT")
    proj = safa.projection()
    assert proj == 36
    tt = TransitionTable(safa, udoc, len(udoc), len(codes), batch_size=2,
                         projection=proj)
    assert tt.doc_subset is not None
    start, end = tt.doc_subset
    assert start <= 36 and end >= len(codes) + 2
    assert start % (end - start) == 0
    assert tt.proj_chunk_idx is not None


def test_auto_batch_size():
    safa, codes, udoc = build("hello.*", "helo wrd", "hello world")
    tt = TransitionTable(safa, udoc, len(udoc), len(codes), batch_size=0)
    assert tt.batch_size > 1
