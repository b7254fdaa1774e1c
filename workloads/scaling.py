#!/usr/bin/env python
"""Proof-size / verify-time scaling measurement (VERDICT r1 item #9).

Runs commit+prove+verify in-process over growing documents for two
protocol regimes — skip-heavy (`.*spam` over ascii filler: constant trace
length regardless of doc size, Reef's headline trick) and skip-free
(anchored `^a*b$`: trace ~ doc length, the IVC's worst case) — and prints
a markdown table of {doc size, fold count, proof bytes, prove s, verify s}
for BENCHMARKS.md.

    python workloads/scaling.py [--max-kb 8]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run_case(regex: str, ab: str, doc: str, batch: int):
    from reef_tpu.backend import framework as FW
    from reef_tpu.frontend import parser, regex as R
    from reef_tpu.frontend.safa import SAFA
    from reef_tpu.utils import serialize as SZ

    r = R.simpl(parser.parse(regex))
    safa = SAFA(ab, r)
    codes = [ord(c) for c in doc]
    t0 = time.time()
    commit, dc = FW.run_committer(codes, safa.ab, False, seed=99)
    t_commit = time.time() - t0
    t0 = time.time()
    proofs = FW.run_prover(commit, dc, safa, codes, batch_size=batch)
    t_prove = time.time() - t0
    size = len(SZ.dumps("proof", proofs))
    t0 = time.time()
    ok = FW.run_verifier(commit, safa, proofs, batch_size=batch)
    t_verify = time.time() - t0
    assert ok
    return proofs.ivc.n_steps, size, t_commit, t_prove, t_verify


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-kb", type=int, default=8)
    args = ap.parse_args()

    print("| regime | doc bytes | folds | proof bytes | commit s |"
          " prove s | verify s |")
    print("|---|---|---|---|---|---|---|")
    kb = 1
    sizes = [100]
    while kb <= args.max_kb:
        sizes.append(kb * 1024)
        kb *= 4
    for n in sizes:
        doc = "a" * (n - 4) + "spam"
        folds, size, tc, tp, tv = run_case(".*spam", "amsp", doc, 0)
        print(f"| skip-heavy `.*spam` | {n} | {folds} | {size} |"
              f" {tc:.1f} | {tp:.1f} | {tv:.1f} |", flush=True)
    for n in [16, 64, 128]:
        doc = "a" * (n - 1) + "b"
        folds, size, tc, tp, tv = run_case("^a*b$", "ab", doc, 0)
        print(f"| skip-free `^a*b$` | {n} | {folds} | {size} |"
              f" {tc:.1f} | {tp:.1f} | {tv:.1f} |", flush=True)


if __name__ == "__main__":
    main()
