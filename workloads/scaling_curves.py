"""Sharded-kernel scaling curves on the virtual CPU mesh (SURVEY §7 st.8).

Measures the mesh-sharded nlookup sumcheck and the mesh-sharded MSM at
1/2/4/8 virtual devices and prints a table for BENCHMARKS.md.  Absolute
multi-chip speed is NOT measurable here (8 virtual devices share 4 host
cores — compute-bound kernels cannot go faster than 1x), so the table
reports the sharding OVERHEAD curve: how much wall time the SPMD
partitioning + collectives add over the single-device run of the same
total workload.  On a real pod slice the same kernels spread over real
chips; XLA inserts the same collectives over ICI.

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python workloads/scaling_curves.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("REEF_MSM_CACHE", "1")
os.environ.setdefault("REEF_MESH_MSM_CHUNK", "64")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_root, "tests", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import random  # noqa: E402

from reef_tpu.backend import sumcheck as SC  # noqa: E402
from reef_tpu.ops import field as F  # noqa: E402
from reef_tpu.ops.limb import FQ as LFQ  # noqa: E402


def bench_sumcheck(n_dev: int, ell: int = 12, iters: int = 3) -> float:
    """Seconds per full nlookup sumcheck (table 2^ell) on n_dev devices."""
    from reef_tpu.parallel.mesh import make_mesh, sharded_table_cache
    from reef_tpu.ops.sumcheck_device import DeviceTableCache

    f = F.FQ
    rng = random.Random(7)
    table = [rng.randrange(f.p) for _ in range(1 << ell)]
    qs = [rng.randrange(len(table)) for _ in range(8)]
    vs = [table[q] for q in qs]
    prev_q = [rng.randrange(f.p) for _ in range(ell)]
    prev_v = SC.verifier_mle_eval(f, table, prev_q)
    if n_dev == 1:
        cache = DeviceTableCache(LFQ, table)
    else:
        cache = sharded_table_cache(LFQ, table, make_mesh(n_dev))
    args = (f, table, qs, vs, prev_q, prev_v, "nl")
    SC.nlookup_prove(*args, device_cache=cache)      # warm/compile
    t0 = time.time()
    for _ in range(iters):
        SC.nlookup_prove(*args, device_cache=cache)
    return (time.time() - t0) / iters


def bench_msm(n_dev: int, iters: int = 2) -> float:
    """Seconds per 512-point sharded MSM (one 64-chunk per device at 8)."""
    from reef_tpu.ec.msm import pallas_kernels
    from reef_tpu.ec.pasta import PALLAS
    from reef_tpu.parallel.mesh import ShardedBasis, make_mesh, sharded_msm

    rng = random.Random(9)
    ck = pallas_kernels()
    n = 512
    pts = []
    acc = PALLAS.gen
    for _ in range(n):
        acc = PALLAS.add(acc, PALLAS.gen)
        pts.append(acc)
    scalars = [rng.randrange(PALLAS.order) for _ in range(n)]
    mesh = make_mesh(n_dev)
    basis = ShardedBasis(ck, pts, mesh)
    got = sharded_msm(mesh, ck, scalars, basis)      # warm/compile
    assert got == PALLAS.msm(scalars, pts)
    t0 = time.time()
    for _ in range(iters):
        sharded_msm(mesh, ck, scalars, basis)
    return (time.time() - t0) / iters


def run_one(n_dev: int):
    sc = bench_sumcheck(n_dev)
    ms = bench_msm(n_dev) if n_dev > 1 else None
    print(f"RESULT n_dev={n_dev} sumcheck={sc:.2f}"
          + (f" msm512={ms:.2f}" if ms else ""), flush=True)


def main():
    # each mesh shape runs in its OWN subprocess: one process compiling
    # every shape pins enough memory mappings (~10-16k per SPMD module)
    # to exhaust vm.max_map_count mid-compile — jax.clear_caches() was
    # not enough (observed SIGSEGV/ENOMEM at the n_dev=2 compiles)
    import re
    import subprocess
    devs = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    print(f"devices available: {len(jax.devices())}", flush=True)
    rows = []
    for n_dev in devs:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--only",
             str(n_dev)], capture_output=True, text=True)
        m = re.search(r"RESULT n_dev=(\d+) sumcheck=([\d.]+)"
                      r"(?: msm512=([\d.]+))?", r.stdout or "")
        if not m:
            tail = (r.stderr or "").strip().splitlines()[-3:]
            print(f"n_dev={n_dev}: FAILED rc={r.returncode} {tail}",
                  flush=True)
            rows.append((n_dev, None, None))
            continue
        sc = float(m.group(2))
        ms = float(m.group(3)) if m.group(3) else None
        rows.append((n_dev, sc, ms))
        print(f"n_dev={n_dev}: sumcheck {sc:.2f}s/proof"
              + (f", msm512 {ms:.2f}s" if ms else " (msm: single-dev "
                 "path is ec.msm_v3, not the mesh kernel)"), flush=True)
    print("\n| devices | nlookup sumcheck (2^12 table) s | sharded MSM "
          "(512 pts) s |")
    print("|---|---|---|")
    for n_dev, sc, ms in rows:
        if sc is None:
            print(f"| {n_dev} | failed | failed |")
            continue
        print(f"| {n_dev} | {sc:.2f} | "
              + (f"{ms:.2f} |" if ms else "n/a (single-chip kernel) |"))


if __name__ == "__main__":
    if "--only" in sys.argv:
        run_one(int(sys.argv[sys.argv.index("--only") + 1]))
    else:
        main()
