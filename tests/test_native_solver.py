"""Native C++ solver vs the Python solver (match parity + trace validity)."""

import pytest

from reef_tpu.frontend import parser, regex as R
from reef_tpu.frontend.native_solver import _load, solve_native
from reef_tpu.frontend.safa import SAFA
from tests.test_frontend import CORPUS, check_trace

needs_native = pytest.mark.skipif(_load() is None,
                                  reason="g++ toolchain unavailable")


@needs_native
@pytest.mark.parametrize("rstr,doc,ab", CORPUS,
                         ids=[f"{r}~{d}" for r, d, ab in CORPUS])
def test_native_matches_python(rstr, doc, ab):
    r = R.simpl(parser.parse(rstr))
    safa = SAFA(ab, r)
    codes = [ord(c) for c in doc]
    py = safa.solve(codes, native=False)
    nat = solve_native(safa, codes)
    assert (py is None) == (nat is None)
    if nat is not None:
        check_trace(safa, nat, codes)


@needs_native
def test_native_large_doc():
    n = 200000
    doc = [ord("A")] * n + [ord(c) for c in "CGTA"]
    r = R.simpl(parser.parse(f"^.{{{n}}}CGTA$"))
    safa = SAFA("ACGT", r)
    import time
    t0 = time.time()
    got = solve_native(safa, doc)
    dt = time.time() - t0
    assert got is not None
    assert any(e.is_skip and e.to_cur - e.from_cur == n for e in got)
    assert dt < 10, f"native solver too slow: {dt}s"
