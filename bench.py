#!/usr/bin/env python
"""reef_tpu benchmark driver — prints ONE JSON line.

Runs on the real TPU (the session's default axon platform).  Headline metric
for now: batched Poseidon (arity-4, t=5, 255-bit Pasta field) permutations per
second per chip — the reference's hottest hash kernel (neptune sponge, used
for every nlookup Fiat-Shamir round and Merkle node,
/root/reference/src/backend/r1cs.rs:2260-2310, merkle_tree.rs:25-104).

vs_baseline: the reference publishes no in-repo numbers and cannot be built
here (zero egress, no vendored crates — see BASELINE.md); the denominator is
an estimated single-core neptune arity-4 throughput of 2e5 perms/s on server
x86 (typical published neptune bench magnitude).  Replace with a measured
number when a built reference is available.
"""

import json
import time

NEPTUNE_CPU_PERMS_PER_S = 2.0e5  # estimated reference baseline (see docstring)


def bench_poseidon(batch: int = 1 << 15, iters: int = 20) -> float:
    import jax
    import jax.numpy as jnp
    from reef_tpu.ops import limb, poseidon

    lf = limb.FQ
    t = 5
    # deterministic pseudo-random state from a cheap device-side LCG is
    # overkill; just tile a few host-encoded rows
    import numpy as np

    base = lf.encode_host(list(range(1, t * 8 + 1))).reshape(8, t, limb.N)
    state = jnp.asarray(np.tile(base, (batch // 8, 1, 1)))

    fn = jax.jit(lambda s: poseidon.permute(lf, s, t))
    out = fn(state)
    _ = np.asarray(out)  # compile + warm; NB block_until_ready does not
    # actually block on the tunneled axon platform — force a transfer
    t0 = time.time()
    for _ in range(iters):
        out = fn(out)
    _ = np.asarray(out[0, 0, 0])
    dt = (time.time() - t0) / iters
    return batch / dt


def main():
    perms_per_s = bench_poseidon()
    print(
        json.dumps(
            {
                "metric": "poseidon_permutations_per_s_per_chip",
                "value": round(perms_per_s, 1),
                "unit": "perm/s",
                "vs_baseline": round(perms_per_s / NEPTUNE_CPU_PERMS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
