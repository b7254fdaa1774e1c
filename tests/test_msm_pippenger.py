"""Device Pippenger MSM (ec/msm_pippenger.py) vs the python-int host oracle.

Covers the production path (DeviceBasis + tree+Fenwick window kernel) at
edge sizes (n=1, 2, non-power-of-two) and with degenerate scalars
(0, 1, order-1, duplicates).  Marked slow: each fresh n compiles a new
bounded-graph kernel (minutes on XLA CPU; cached across runs via the
conftest persistent compile cache).

Reference parity: the fold/commit MSM hot spot, framework.rs:668 and the
hyrax commit path, commitment.rs:182-187.
"""

import random

import pytest

from reef_tpu.ec import msm_pippenger as mp
from reef_tpu.ec.msm import pallas_kernels
from reef_tpu.ec.pasta import PALLAS

# slowest: the device-MSM window kernels bypass the persistent compile
# cache (XLA:CPU cannot round-trip their executables; ec/msm.py
# no_persistent_cache) and recompile per process
pytestmark = [pytest.mark.slow, pytest.mark.slowest]


def _host_msm(cv, scalars, pts):
    acc = None
    for s, p in zip(scalars, pts):
        acc = cv.add(acc, cv.mul(s, p))
    return acc


def _points(cv, rng, n):
    return [cv.mul(rng.randrange(1, cv.order), cv.gen) for _ in range(n)]


@pytest.mark.parametrize("n", [1, 2, 8])
def test_msm_device_small(n):
    rng = random.Random(7 + n)
    ck = pallas_kernels()
    pts = _points(PALLAS, rng, n)
    scs = [rng.randrange(0, PALLAS.order) for _ in range(n)]
    assert mp.msm_device(ck, scs, pts) == _host_msm(PALLAS, scs, pts)


def test_msm_device_edge_scalars_and_padding():
    """Non-power-of-two n (pads with zero scalars) + degenerate scalars."""
    rng = random.Random(41)
    ck = pallas_kernels()
    n = 13                                    # pads to 16
    pts = _points(PALLAS, rng, n)
    scs = [rng.randrange(0, PALLAS.order) for _ in range(n)]
    scs[0] = 0
    scs[1] = 1
    scs[2] = PALLAS.order - 1
    scs[3] = scs[4]                            # duplicate digits
    assert mp.msm_device(ck, scs, pts) == _host_msm(PALLAS, scs, pts)


def test_msm_device_basis_reuse():
    """DeviceBasis: one upload, multiple scalar sets, shorter scalar list."""
    rng = random.Random(99)
    ck = pallas_kernels()
    pts = _points(PALLAS, rng, 8)
    basis = mp.DeviceBasis(ck, pts)
    for trial in range(2):
        scs = [rng.randrange(0, PALLAS.order) for _ in range(8)]
        assert mp.msm_device(ck, scs, basis) == _host_msm(PALLAS, scs, pts)
    scs5 = [rng.randrange(0, PALLAS.order) for _ in range(5)]
    assert mp.msm_device(ck, scs5, basis) == _host_msm(PALLAS, scs5, pts[:5])


def test_window_prep_v2_fenwick_indices():
    """Host-side check: the Fenwick (level, index, mask) decomposition
    reconstructs every boundary prefix sum over plain integers."""
    rng = random.Random(3)
    n = 16
    scs = [rng.randrange(0, PALLAS.order) for _ in range(n)]
    order, lv_idx, lv_mask = mp.window_prep_v2(scs, PALLAS.order, n)
    digs = mp._digits_np(scs, PALLAS.order)
    for w in range(0, mp.N_WINDOWS, 7):
        vals = [1 << i for i in order[w]]      # distinguishable "points"
        # tree levels over ints
        levels = [list(vals)]
        cur = list(vals)
        while len(cur) > 1:
            cur = [cur[i] + cur[i + 1] for i in range(0, len(cur), 2)]
            levels.append(cur)
        flat = [x for lvl in levels for x in lvl]
        D = lv_idx.shape[-1]
        for d in range(1, D + 1):
            m = int((digs[w] >= d).sum())
            want = sum(vals[:m])
            got = 0
            for b in range(lv_idx.shape[0]):
                if lv_mask[b, w, d - 1]:
                    got += flat[lv_idx[b, w, d - 1]]
            assert got == want, (w, d, m)


def test_pedersen_commit_device_gate(monkeypatch):
    """REEF_DEVICE_MSM=1 routes PedersenGens.commit through the device
    Pippenger (cached DeviceBasis) and matches the host path exactly."""
    from reef_tpu.backend import commitment as C

    rng = random.Random(11)
    monkeypatch.setattr(C, "DEVICE_MSM_MIN_N", 4)
    gens = C.PedersenGens(PALLAS, b"test/devmsm", 8)
    vals = [rng.randrange(PALLAS.order) for _ in range(8)]
    blind = rng.randrange(PALLAS.order)
    host = gens.commit(vals, blind)
    monkeypatch.setenv("REEF_DEVICE_MSM", "1")
    dev = gens.commit(vals, blind)
    assert dev == host


def test_msm_device_chunked_matches_oracle(monkeypatch):
    """REEF_DEVICE_MSM_CHUNK splits an MSM across repeated invocations of
    the chunk-sized kernel (the tunneled compiler wedges on large window
    kernels); the chunked result must be bit-exact vs the host oracle."""
    monkeypatch.setenv("REEF_DEVICE_MSM_CHUNK", "16")
    ck = pallas_kernels()
    n = 64
    pts = [PALLAS.mul(i + 2, PALLAS.gen) for i in range(n)]
    basis = mp.DeviceBasis(ck, pts)
    rng = random.Random(77)
    scs = [rng.randrange(PALLAS.order) for _ in range(n)]
    assert mp.msm_device(ck, scs, basis) == _host_msm(PALLAS, scs, pts)
