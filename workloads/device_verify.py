#!/usr/bin/env python
"""Real-TPU device-offload revalidation (BENCHMARKS.md bottleneck #5).

Drives the three production device paths on the real chip and cross-checks
each against the python-int host oracle (exact equality — field math):

  1. chunked device Pippenger MSM (`ec/msm_pippenger.msm_device`) at a size
     ABOVE the per-kernel chunk cap, vs the host `Curve.mul/add` oracle;
  2. device nlookup sumcheck (`ops/sumcheck_device.DeviceTableCache` via
     `backend.sumcheck.nlookup_prove`) at the rate-8 sponge shapes, vs the
     host prover's transcript (bit-identical coefficients + final claim);
  3. a full CLI-equivalent e2e prove with REEF_DEVICE_SUMCHECK=1 +
     REEF_DEVICE_MSM=1, verified by the (host) verifier.

Exits non-zero on any mismatch.  Run: `python workloads/device_verify.py`.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def check_platform():
    import jax
    plat = jax.devices()[0].platform
    log(f"platform: {plat} ({jax.devices()[0]})")
    return plat


def verify_device_msm(n=12288, chunk=4096):
    """Chunked device MSM above the chunk cap, bit-exact vs host oracle."""
    prev_chunk = os.environ.get("REEF_DEVICE_MSM_CHUNK")
    os.environ["REEF_DEVICE_MSM_CHUNK"] = str(chunk)
    try:
        from reef_tpu.ec import msm as M
        from reef_tpu.ec import msm_pippenger as MP
        from reef_tpu.ec.pasta import VESTA

        rng = random.Random(7)
        base = [VESTA.mul(rng.randrange(1, 1 << 64), VESTA.gen)
                for _ in range(256)]
        pts = (base * (n // len(base) + 1))[:n]
        scalars = [rng.randrange(VESTA.order) for _ in range(n)]
        ck = M.vesta_kernels()
        t0 = time.time()
        got = MP.msm_device(ck, scalars, pts)
        dt = time.time() - t0
        # host oracle: the native C++ Pippenger (an independent
        # implementation; itself cross-checked vs python-int adds in
        # tests/test_ec.py)
        want = VESTA.msm(scalars, pts)
        assert got == want, f"device MSM mismatch: {got} != {want}"
        log(f"PASS device chunked MSM n={n} chunk={chunk} ({dt:.1f}s incl. "
            "upload/compile)")
    finally:
        if prev_chunk is None:
            os.environ.pop("REEF_DEVICE_MSM_CHUNK", None)
        else:
            os.environ["REEF_DEVICE_MSM_CHUNK"] = prev_chunk


def verify_device_msm_v3(n=12288, cap=4096):
    """v3 (production route): fused-padd chunk-scanned kernel with
    on-device prep, bit-exact vs host oracle at a non-power-of-2 n above
    the chunk cap."""
    from reef_tpu.ec import msm as M
    from reef_tpu.ec import msm_v3 as V3
    from reef_tpu.ec.pasta import VESTA

    rng = random.Random(11)
    base = [VESTA.mul(rng.randrange(1, 1 << 64), VESTA.gen)
            for _ in range(256)]
    pts = (base * (n // len(base) + 1))[:n]
    scalars = [rng.randrange(VESTA.order) for _ in range(n)]
    scalars[0] = 0
    ck = M.vesta_kernels()
    basis = V3.DeviceBasisV3(ck, pts, cap=cap)
    t0 = time.time()
    got = V3.msm_device_v3(ck, scalars, basis)
    dt = time.time() - t0
    want = VESTA.msm(scalars, pts)
    assert got == want, f"v3 device MSM mismatch: {got} != {want}"
    log(f"PASS device MSM v3 n={n} cap={cap} ({dt:.1f}s incl. compile)")


def verify_device_msm_rows(n=4096, R=3, cap=4096):
    """Row-batched MSM (the device-routed Hyrax commit_rows path: one
    dispatch for all rows + on-device window combine) vs host oracle."""
    from reef_tpu.ec import msm as M
    from reef_tpu.ec import msm_v3 as V3
    from reef_tpu.ec.pasta import PALLAS

    rng = random.Random(17)
    base = [PALLAS.mul(rng.randrange(1, 1 << 64), PALLAS.gen)
            for _ in range(128)]
    pts = (base * (n // len(base) + 1))[:n]
    ck = M.pallas_kernels()
    basis = V3.DeviceBasisV3(ck, pts, cap=cap)
    rows = [[rng.randrange(PALLAS.order) for _ in range(n)]
            for _ in range(R)]
    rows[0][3] = 0
    t0 = time.time()
    got = V3.msm_device_v3_rows(ck, rows, basis)
    dt = time.time() - t0
    for r in range(R):
        assert got[r] == PALLAS.msm(rows[r], pts), f"rows MSM row {r}"
    log(f"PASS device rows MSM R={R} n={n} cap={cap} "
        f"({dt:.1f}s incl. compile)")


def verify_device_sumcheck(ell=12):
    """Device nlookup sumcheck transcript == host transcript, rate-8 shape."""
    from reef_tpu.backend import sumcheck as SC
    from reef_tpu.ops import field as F
    from reef_tpu.ops.limb import FQ as LFQ
    from reef_tpu.ops.sumcheck_device import DeviceTableCache

    f = F.FQ
    rng = random.Random(9)
    table = [rng.randrange(f.p) for _ in range(1 << ell)]
    qs = [rng.randrange(len(table)) for _ in range(8)]
    vs = [table[q] for q in qs]
    prev_q = [rng.randrange(f.p) for _ in range(ell)]
    prev_v = SC.verifier_mle_eval(f, table, prev_q)
    host = SC.nlookup_prove(f, table, qs, vs, prev_q, prev_v, "nl")
    t0 = time.time()
    cache = DeviceTableCache(LFQ, table)
    dev = SC.nlookup_prove(f, table, qs, vs, prev_q, prev_v, "nl",
                           device_cache=cache)
    dt = time.time() - t0
    assert host == dev, "device sumcheck transcript != host transcript"
    log(f"PASS device nlookup sumcheck ell={ell} bit-identical transcript "
        f"({dt:.1f}s incl. compile)")


def verify_e2e_offload():
    """Full prove/verify with both offloads forced on."""
    os.environ["REEF_DEVICE_SUMCHECK"] = "1"
    os.environ["REEF_DEVICE_MSM"] = "1"
    from reef_tpu.backend import framework as FW
    from reef_tpu.frontend import parser, regex as R
    from reef_tpu.frontend.safa import SAFA

    r = R.simpl(parser.parse(".*b"))
    safa = SAFA("ab", r)
    codes = [ord(c) for c in "aaaaaaab"]
    t0 = time.time()
    commit, dc = FW.run_committer(codes, safa.ab, False, seed=3)
    proofs = FW.run_prover(commit, dc, safa, codes, batch_size=0)
    ok = FW.run_verifier(commit, safa, proofs, batch_size=0)
    assert ok, "e2e with device offload failed verification"
    log(f"PASS e2e prove+verify with REEF_DEVICE_SUMCHECK=1 REEF_DEVICE_MSM=1 "
        f"({time.time() - t0:.1f}s)")


def verify_poseidon_pallas(B=2048):
    """Fused-pallas Poseidon vs the python-int host permutation oracle."""
    import numpy as np
    import jax.numpy as jnp
    from reef_tpu.ops import limb, poseidon_pallas
    from reef_tpu.ops.limb import FQ as lf
    from reef_tpu.ops.poseidon_constants import host_permutation

    t = 5
    rng = random.Random(11)
    vals = [rng.randrange(lf.p_int) for _ in range(B * t)]
    state = jnp.asarray(lf.encode(vals).reshape(B, t, limb.N))
    t0 = time.time()
    got = np.asarray(poseidon_pallas.permute_jit(lf, state, t))
    dt = time.time() - t0
    # host oracle on a sample of rows (python-int permutation)
    for row in (0, 1, B // 2, B - 1):
        want = host_permutation(lf.host.p, vals[row * t:(row + 1) * t])
        got_row = lf.decode(got[row])
        assert got_row == want, f"pallas poseidon row {row} mismatch"
    log(f"PASS fused-pallas Poseidon B={B} vs host oracle "
        f"({dt:.1f}s incl. compile)")


if __name__ == "__main__":
    # --driver: the bench.py gate. Runs the oracle cross-checks NOT
    # already asserted live inside other driver stages: fused-pallas
    # Poseidon vs the python-int permutation and the device nlookup
    # sumcheck vs the host transcript.  The two omitted classes are
    # gated elsewhere in the same driver run: v3 MSM bit-exactness is a
    # hard assert inside bench_msm_device (a perf number for a wrong
    # kernel is void), and the device-engine e2e is proved AND verified
    # inside bench_e2e_device_vs_host.  The full revalidation (v2
    # chunked MSM, v3 at a non-production shape, forced-offload e2e)
    # stays `python workloads/device_verify.py` with no flag — run it
    # for BENCHMARKS.md, not per-driver-round (it was 1055s of a 1500s
    # budget: the gate most worth running live was the one structurally
    # starved, VERDICT r4 weak #2).
    driver_mode = "--driver" in sys.argv
    plat = check_platform()
    verify_poseidon_pallas()
    # each fold round is its own kernel shape -> its own tunnel compile
    # (~25s each); ell=10 keeps the class representative at ~60% the cost
    verify_device_sumcheck(ell=10 if driver_mode else 12)
    # the rows kernel (device-routed Hyrax commit_rows) is asserted in
    # BOTH modes: no other driver stage exercises it live
    verify_device_msm_rows()
    if not driver_mode:
        verify_device_msm()
        verify_device_msm_v3()
        verify_e2e_offload()
    log(f"ALL PASS (platform={plat}, "
        f"{'driver gate' if driver_mode else 'full'})")
