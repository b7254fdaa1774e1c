"""native/fieldvec.cpp vs python big-int oracles (exact equality)."""

import random

import pytest

from reef_tpu.ops import field as F
from reef_tpu.ops import native_fieldvec as FV

pytestmark = pytest.mark.skipif(not FV.available(),
                                reason="no native toolchain")

rng = random.Random(31337)


def rvec(n, p):
    return [rng.randrange(p) for _ in range(n)]


@pytest.mark.parametrize("p", [F.P, F.Q])
def test_fold_vec(p):
    a, b = rvec(33, p), rvec(33, p)
    r = rng.randrange(p)
    assert FV.fold_vec(a, b, r, p) == [(x + r * y) % p for x, y in
                                       zip(a, b)]


@pytest.mark.parametrize("p", [F.P, F.Q])
def test_cross_term(p):
    n = 17
    vs = [rvec(n, p) for _ in range(6)]
    u1 = rng.randrange(p)
    got = FV.cross_term(*vs, u1, p)
    az1, bz1, cz1, az2, bz2, cz2 = vs
    want = [(az1[i] * bz2[i] + az2[i] * bz1[i] - u1 * cz2[i] - cz1[i]) % p
            for i in range(n)]
    assert got == want


@pytest.mark.parametrize("p", [F.P, F.Q])
def test_matvec(p):
    n_out, n_z = 13, 21
    coo = [(rng.randrange(n_out), rng.randrange(n_z), rng.randrange(p))
           for _ in range(60)]
    mat = FV.SparseMat(coo, p)
    z = rvec(n_z, p)
    got = mat.matvec(z, n_out)
    want = [0] * n_out
    for (i, j, v) in coo:
        want[i] = (want[i] + v * z[j]) % p
    assert got == want


@pytest.mark.parametrize("p", [F.P, F.Q])
def test_sumcheck_round_kernels(p):
    n = 16
    eq, az, bz, cz, e = (rvec(n, p) for _ in range(5))
    u = rng.randrange(p)
    tabs = [FV.MontTable(v, p) for v in (eq, az, bz, cz, e)]
    got = FV.sc1_evals(*tabs, u, p)

    def ev(tab, b, half, t):
        return (tab[b] + t * (tab[b + half] - tab[b])) % p

    half = n // 2
    want = []
    for tv in range(4):
        s = 0
        for b in range(half):
            s += ev(eq, b, half, tv) * ((ev(az, b, half, tv)
                                         * ev(bz, b, half, tv)
                                         - u * ev(cz, b, half, tv)
                                         - ev(e, b, half, tv)) % p)
        want.append(s % p)
    assert got == want

    # fold and check first element
    r = rng.randrange(p)
    for t, v in zip(tabs, (eq, az, bz, cz, e)):
        t.fold(r)
    folded_eq = [(eq[b] + r * (eq[b + half] - eq[b])) % p
                 for b in range(half)]
    assert tabs[0].first() == folded_eq[0]

    # sc2
    m, zt = rvec(n, p), rvec(n, p)
    mt, ztt = FV.MontTable(m, p), FV.MontTable(zt, p)
    got2 = FV.sc2_evals(mt, ztt, p)
    want2 = []
    for tv in range(3):
        s = sum(ev(m, b, half, tv) * ev(zt, b, half, tv)
                for b in range(half))
        want2.append(s % p)
    assert got2 == want2


@pytest.mark.parametrize("p", [F.P, F.Q])
def test_eq_evals(p):
    from reef_tpu.backend.commitment import eq_evals

    class _F:
        pass
    _F.p = p
    point = rvec(5, p)
    assert FV.eq_evals_native(point, p) == eq_evals(_F, point)


@pytest.mark.parametrize("p", [F.P, F.Q])
def test_bilinear_and_dot(p):
    n = 8
    coo = [(rng.randrange(n), rng.randrange(n), rng.randrange(p))
           for _ in range(30)]
    mat = FV.SparseMat(coo, p)
    rx, ry = rvec(3, p), rvec(3, p)
    ex = FV.eq_evals_mont(rx, p)
    ey = FV.eq_evals_mont(ry, p)
    got = FV.bilinear(mat, ex, ey)
    exl = FV.eq_evals_native(rx, p)
    eyl = FV.eq_evals_native(ry, p)
    want = sum(v * exl[i] % p * eyl[j] for (i, j, v) in coo) % p
    assert got == want

    a, b = rvec(19, p), rvec(19, p)
    assert FV.dot(a, b, p) == sum(x * y for x, y in zip(a, b)) % p


def test_mtab_accum():
    p = F.Q
    n = 8
    coo = [(rng.randrange(4), rng.randrange(n), rng.randrange(p))
           for _ in range(20)]
    mat = FV.SparseMat(coo, p)
    mtab = FV.MontTable([0] * n, p)
    ex = FV.eq_evals_mont(rvec(2, p), p)
    exl = FV.unpack_mont(ex) if hasattr(FV, "unpack_mont") else None
    coeff = rng.randrange(p)
    mat.mtab_accum(mtab.buf, ex.buf, coeff)
    # oracle
    import ctypes
    lib = FV._load()
    out = ctypes.create_string_buffer(32 * n)
    lib.fv_from_mont(out, mtab.buf, n, FV.FIELD_ID[p])
    got = FV.unpack(out.raw, n)
    ex_std = [int.from_bytes(b, "little") for b in []]
    # recompute eq std
    exv = None
    # re-derive eq values from the mont table
    out2 = ctypes.create_string_buffer(32 * ex.n)
    lib.fv_from_mont(out2, ex.buf, ex.n, FV.FIELD_ID[p])
    eql = FV.unpack(out2.raw, ex.n)
    want = [0] * n
    for (i, j, v) in coo:
        want[j] = (want[j] + coeff * v % p * eql[i]) % p
    assert got == want
