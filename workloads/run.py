#!/usr/bin/env python
"""Benchmark workloads mirroring the reference's tests/scripts/*.sh
(dna.sh, password.sh, pihole.sh, email_dkim.sh, zombie.sh — SURVEY.md §6).

Generates synthetic documents of the same character and drives the CLI
end-to-end, appending metrics CSV per run:

    python workloads/run.py dna --size 10000
    python workloads/run.py password
    python workloads/run.py pihole
    python workloads/run.py dkim --size 1024
    python workloads/run.py all
"""

import argparse
import os
import random
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_UNI_CACHE = {}


def _uni_doc(n: int, tail: str) -> str:
    """Deterministic multi-script (latin/accents/CJK/emoji) document of
    ~n BYTES ending in `tail` (offsets in the regexes are CODEPOINTS)."""
    key = (n, tail)
    if key not in _UNI_CACHE:
        unit = "naïve café — 世界🌍: ab "
        reps = max(1, (n - 32) // len(unit.encode()))
        _UNI_CACHE[key] = unit * reps + tail
    return _UNI_CACHE[key]

WORKLOADS = {
    # name: (alphabet, regex builder, doc builder, extra flags)
    "dna": {
        "alphabet": "dna",
        "regex": lambda n: f"^.{{{n - 24}}}ATGGGCTACAGAAACCGTGCCAAA.*",
        "doc": lambda n, rng: "".join(rng.choice("ACGT")
                                      for _ in range(n - 24))
        + "ATGGGCTACAGAAACCGTGCCAAA",
        "flags": [],
    },
    "password": {
        "alphabet": "ascii",
        "regex": lambda n: "^(?=.*[A-Z].*[A-Z])(?=.*[a-z]).{12}$",
        "doc": lambda n, rng: "xKwP3q9ZtmBv"[:12],
        "flags": [],
    },
    "pihole": {
        "alphabet": "ascii",
        "regex": lambda n: r"^(.+[_.-])?telemetry[_.-]",
        "doc": lambda n, rng: "app.telemetry.example.com/path?q=1",
        "flags": [],
    },
    "dkim": {
        "alphabet": "ascii",
        "regex": lambda n: "dkim-signature: v=1; a=rsa-sha256.*",
        "doc": lambda n, rng: ("x-header: " + "a" * max(0, n - 60)
                               + "\ndkim-signature: v=1; a=rsa-sha256; stuff"),
        "flags": [],
    },
    "zombie_date": {
        "alphabet": "ascii",
        "regex": lambda n: r"[0-9][0-9]/[0-9][0-9]/[0-9][0-9]",
        "doc": lambda n, rng: "a" * max(0, n - 10) + " 12/25/23 x",
        "flags": [],
    },
    # BASELINE.json config 4: projections + hybrid nlookup on a long doc
    "proj_hybrid": {
        "alphabet": "ascii",
        "regex": lambda n: f"^.{{{max(0, n - 16)}}}needleinhaystack.*",
        "doc": lambda n, rng: "h" * max(0, n - 16) + "needleinhaystack",
        "flags": ["-p", "-y"],
    },
    # full-unicode utf8 (config.rs:253-263 semantics): CJK + accented
    # codepoints, range-class derivative edges, no alphabet enumeration
    "unicode": {
        "alphabet": "utf8",
        "regex": lambda n: "café.*世界",
        "doc": lambda n, rng: ("naïve " * max(1, n // 12))[:max(0, n - 12)]
        + "café — 世界",
        "flags": [],
    },
    # BASELINE.json config 5 AT SCALE: utf8 --merkle --negate on a
    # multi-script (latin/accents/CJK/emoji) doc of 100 KB+.  The
    # anchored skip regex names a forbidden motif at a fixed offset; the
    # complement-skip edge jumps the prefix, so the non-match proof stays
    # O(1) folds while the merkle commitment covers every codepoint.
    # Offsets are in CODEPOINTS (doc built so the byte size ~= n).
    "unicode_mn": {
        "alphabet": "utf8",
        "regex": lambda n: f"^.{{{n - 6}}}禁🛑MARK.*",
        "doc": lambda n, rng: _uni_doc(n, "终端OK"),
        "flags": ["-m", "-n"],
    },
    # utf8 projections + hybrid at scale: prove the motif at the end of a
    # 100 KB+ multi-script doc against only the provable chunk
    "unicode_proj": {
        "alphabet": "utf8",
        "regex": lambda n: f"^.{{{n - 5}}}世界END.*",
        "doc": lambda n, rng: _uni_doc(n, "世界END"),
        "flags": ["-p", "-y"],
    },
    # BASELINE.json config 5: merkle commitment + negated non-match proof
    "merkle_negate": {
        "alphabet": "ascii",
        "regex": lambda n: f"^.{{{max(0, n - 24)}}}FORBIDDEN-MARKER-XYZQ.*",
        "doc": lambda n, rng: "".join(rng.choice("abcdefgh")
                                      for _ in range(n)),
        "flags": ["-m", "-n"],
    },
}


def _host_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT
    # host-only CLI: skip this container's per-process TPU plugin
    # registration (~2.2s `import jax` via sitecustomize; bench.py
    # _host_cli_env has the full rationale)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


class ServeWorker:
    """One long-lived `reef_tpu.cli serve` proving worker (JSON lines).

    The deployment shape for a proving service: one process amortizes the
    interpreter+jax import, generator caches, Poseidon templates and the
    circuit-stack cache across every proof (VERDICT r2 #4)."""

    def __init__(self):
        import json
        self._json = json
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "reef_tpu.cli", "serve"],
            env=_host_env(), cwd=ROOT, text=True,
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL)
        ready = self.proc.stdout.readline()
        assert self._json.loads(ready).get("ready"), ready

    def request(self, argv):
        self.proc.stdin.write(self._json.dumps({"argv": argv}) + "\n")
        self.proc.stdin.flush()
        return self._json.loads(self.proc.stdout.readline())

    def close(self):
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=10)
        except Exception:
            self.proc.kill()


def run_one(name, size, batch, metrics, extra_flags=(), worker=None):
    spec = WORKLOADS[name]
    rng = random.Random(42)
    doc = spec["doc"](size, rng)
    regex = spec["regex"](len(doc))
    with tempfile.TemporaryDirectory() as d:
        doc_path = os.path.join(d, f"{name}.txt")
        with open(doc_path, "w") as fh:
            fh.write(doc)
        argv = [spec["alphabet"], "--e2e", "-d", doc_path, "-r", regex,
                "-b", str(batch)]
        argv += list(spec["flags"]) + list(extra_flags)
        if metrics:
            argv += ["--metrics", metrics]
        t0 = time.time()
        if worker is not None:
            # the worker's cwd is the repo root: pin the artifacts into
            # this run's temp dir explicitly
            argv += ["--cmt-name", os.path.join(d, f"{name}.cmt"),
                     "--proof-name", os.path.join(d, f"{name}.proof")]
            resp = worker.request(argv)
            dt = time.time() - t0
            ok = resp.get("ok") and "Verification PASSED" in resp["output"]
            err = resp.get("error", "") + resp.get("output", "")[-2000:]
        else:
            cmd = [sys.executable, "-m", "reef_tpu.cli"] + argv
            r = subprocess.run(cmd, cwd=d, env=_host_env(),
                               capture_output=True, text=True)
            dt = time.time() - t0
            ok = "Verification PASSED" in r.stdout
            err = f"{r.stdout}\n{r.stderr[-2000:]}"
        print(f"{name:12s} doc={len(doc):>8}B  {dt:6.1f}s  "
              f"{'PASS' if ok else 'FAIL'}" + ("" if ok else f"\n{err}"))
        return ok, dt, len(doc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workload", choices=list(WORKLOADS) + ["all"])
    ap.add_argument("--size", type=int, default=1000)
    ap.add_argument("-b", "--batch", type=int, default=0)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--serve", action="store_true",
                    help="route all runs through ONE long-lived serve-mode "
                         "worker (warm path; amortizes per-process costs)")
    args = ap.parse_args()
    names = list(WORKLOADS) if args.workload == "all" else [args.workload]
    worker = ServeWorker() if args.serve else None
    fails = 0
    try:
        for n in names:
            ok, _, _ = run_one(n, args.size, args.batch, args.metrics,
                               worker=worker)
            fails += not ok
    finally:
        if worker is not None:
            worker.close()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
