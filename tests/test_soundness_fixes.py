"""Regression tests for the soundness fixes over the reference (PARITY.md
deviations item 3): each tamper must break a constraint."""

import pytest

from reef_tpu.backend.step_circuit import StepCircuit
from reef_tpu.backend.table import TransitionTable, doc_transform
from reef_tpu.backend.witness import solve_and_batch
from reef_tpu.frontend import parser, regex as R
from reef_tpu.frontend.safa import SAFA
from reef_tpu.ops import field as F

f = F.FQ
SALT, DOC_HASH = 0x5A17, 0xD0C4A54


def build(rstr, ab, doc, batch_size=2):
    r = R.simpl(parser.parse(rstr))
    safa = SAFA(ab, r)
    codes = [ord(c) for c in doc]
    udoc = doc_transform(safa.ab, codes)
    tt = TransitionTable(safa, udoc, len(udoc), len(codes),
                         batch_size=batch_size)
    circ = StepCircuit(tt, DOC_HASH)
    return tt, circ, codes


def batches(tt, circ, codes):
    return list(solve_and_batch(tt, circ, codes, DOC_HASH, SALT))


def assert_rejected(circ, wits):
    vec = circ.compiled.witness(wits)
    assert circ.compiled.check_all(vec) is not None


def test_cursor0_continuity_enforced():
    # the reference drops this constraint (r1cs.rs:1184 pushes `true`);
    # claiming a different cursor_0 than cursor_in (without a pop) must fail
    tt, circ, codes = build("^baa$", "ab", "baa")
    wits, _ = batches(tt, circ, codes)[0]
    # shift the whole cursor chain by +1 (consistent internally) while
    # cursor_in stays 0: only the continuity fix catches this
    bs = tt.batch_size
    for j in range(bs):
        wits[f"cursor_{j+1}"] += 1
    assert_rejected(circ, wits)


def test_qbit_booleanity_enforced():
    # non-boolean nl q bits must be rejected (unconstrained in reference)
    tt, circ, codes = build("^baa$", "ab", "baa")
    wits, _ = batches(tt, circ, codes)[0]
    name = "nl_eq_0_q_0"
    wits[name] = 2  # not a bit
    assert_rejected(circ, wits)


def test_pop_requires_nonempty_stack():
    tt, circ, codes = build("^baa$", "ab", "baa")
    wits, _ = batches(tt, circ, codes)[0]
    # claim a pop (rel_0 = 3) with an empty stack: pointer underflow must
    # break the range check
    wits["rel_0"] = 3
    assert_rejected(circ, wits)


def test_stack_push_hash_binding():
    # forall push: the kid wires must match the rel-code hash
    tt, circ, codes = build("^(?=a.*).*b$", "ab", "aab")
    found = False
    for wits, _ in batches(tt, circ, codes):
        if wits["rel_0"] >= 4:  # a push step
            wits["forall_0_kid_0"] = (wits["forall_0_kid_0"] + 1) % f.p
            assert_rejected(circ, wits)
            found = True
            break
    assert found, "no push step found in trace"


def test_char_range_digits_pinned():
    # round-5 fix (ADVICE r4, high): the forged pair
    # (char_lo - t, char_hi + t*C) leaves v_i unchanged (char_lo's
    # weight is C times char_hi's) while widening the accepted char
    # window — a dishonest prover could consume 'A' through the
    # width-1 row for 'z'.  The digits must be pinned to [0, C].
    tt, circ, codes = build("^z$", "Az", "z")
    C = tt.num_chars  # 4: |ab|=2 + EPSILON/EOF
    wits, _ = batches(tt, circ, codes)[0]
    # honest row for 'z' (code 1): char_lo = char_hi = 1
    assert wits["char_lo_0"] == 1 and wits["char_hi_0"] == 1
    # forge t=1: (0, 1 + C) keeps lo*C + hi == 5 while widening the
    # accepted window to [0, 1+C] — the doc-bound char stays honest;
    # a non-matching doc char would now slip through the row
    wits["char_lo_0"] = 0
    wits["char_hi_0"] = 1 + C
    assert_rejected(circ, wits)


def test_char_range_digits_no_wrap():
    # the wrapped-negative variant: char_lo = -1 mod p passes the
    # relative check (char - char_lo = char + 1 still fits cbits) —
    # assert_fits must reject it
    tt, circ, codes = build("^A$", "Az", "A")
    wits, _ = batches(tt, circ, codes)[0]
    assert wits["char_lo_0"] == 0 and wits["char_hi_0"] == 0
    C = tt.num_chars
    wits["char_lo_0"] = (0 - 1) % f.p  # wraps to p-1; keeps lo*C + hi
    wits["char_hi_0"] = 0 + C
    assert_rejected(circ, wits)


def test_offset_window_enforced():
    # offset outside the [lower, upper] window must fail
    tt, circ, codes = build("^.{3}b$", "ab", "aaab")
    wits, _ = batches(tt, circ, codes)[0]
    # first row is the skip {3}: claim a different offset with consistent
    # cursors
    assert wits["offset_0"] == 3
    wits["offset_0"] = 2
    wits["cursor_1"] = wits["cursor_in"] + 2
    assert_rejected(circ, wits)
