"""CPU guards for the fused-tree MSM algorithm (ec.msm_v3 TPU path).

The Mosaic kernel itself cannot run on CPU, but every piece of math it
relies on can: the 10-mul affine-affine complete add, and the
bit-reversed-placement tree + Fenwick indexing of _chunk_prefixes
(fused_tree=True) with the kernel swapped for a pure-jnp reference that
performs the identical halves pairing.  The kernel's bit-exactness on
the real chip is asserted live in bench.bench_msm_device and
workloads/device_verify.py.

Reference hot spot: commitment.rs:171-198 (Hyrax commit MSM) and
framework.rs:668-675 (per-fold commit MSMs).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from reef_tpu.ec import msm as M
from reef_tpu.ec import msm_v3 as V3
from reef_tpu.ec.pasta import VESTA
from reef_tpu.ops import limb


def test_padd_affine_tiles_matches_oracle():
    """Z1 = Z2 = 1 specialization vs the host curve on plain arrays."""
    from reef_tpu.ec.pallas_ec import padd_affine_tiles

    ck = M.vesta_kernels()
    rng = random.Random(11)
    pts_a = [VESTA.mul(rng.randrange(1, VESTA.order), VESTA.gen)
             for _ in range(6)]
    pts_b = [VESTA.mul(rng.randrange(1, VESTA.order), VESTA.gen)
             for _ in range(5)] + [pts_a[5]]          # include a doubling
    A = ck.to_proj(pts_a)                             # (6, 3, N), Z = 1
    B = ck.to_proj(pts_b)
    X1 = [jnp.asarray(A[:, 0, i]) for i in range(limb.N)]
    Y1 = [jnp.asarray(A[:, 1, i]) for i in range(limb.N)]
    X2 = [jnp.asarray(B[:, 0, i]) for i in range(limb.N)]
    Y2 = [jnp.asarray(B[:, 1, i]) for i in range(limb.N)]
    X3, Y3, Z3 = padd_affine_tiles(ck, X1, Y1, X2, Y2)
    out = np.stack([np.stack([np.asarray(t) for t in c], axis=-1)
                    for c in (X3, Y3, Z3)], axis=1)   # (6, 3, N)
    got = ck.to_affine(out)
    want = [VESTA.add(a, b) for a, b in zip(pts_a, pts_b)]
    assert got == want


def _tree_ref(ck, cap):
    """Pure-jnp stand-in for _tree_call: identical halves pairing and
    level concatenation, affine (X, Y) input with Z = 1 synthesized."""
    from reef_tpu.ec.msm_v3 import _kernel_levels, _padd3

    padd3 = _padd3(ck, use_fused=False)
    klevels = _kernel_levels(cap)

    def call(placed5):
        rows = cap // 128
        p4 = placed5.reshape(2, limb.N, V3.N_WINDOWS, cap)
        one = jnp.asarray(ck.lf.one_mont)[:, None, None]
        z = jnp.broadcast_to(one, (1,) + p4.shape[1:])
        cur = jnp.concatenate([p4, z], axis=0)
        outs = []
        for _ in klevels:
            w = cur.shape[-1]
            cur = padd3(cur[..., : w // 2], cur[..., w // 2:])
            outs.append(cur)
        out4 = jnp.concatenate(outs, axis=-1)
        return out4.reshape(3, limb.N, V3.N_WINDOWS, sum(klevels), 128)

    return call


@pytest.mark.slow
def test_fused_tree_chunk_prefixes_matches_oracle(monkeypatch):
    """The fused-tree algorithm (bit-reversed placement, split Fenwick
    gathers, zero-scalar generator padding) on CPU with a reference tree:
    full MSM result must equal the python-int oracle."""
    monkeypatch.setattr(V3, "_tree_call",
                        lambda ck, cap: _tree_ref(ck, cap))
    ck = M.vesta_kernels()
    rng = random.Random(7)
    cap = 4096
    n = 3000                                    # forces generator padding
    pts = [VESTA.mul(rng.randrange(1, 1 << 48), VESTA.gen)
           for _ in range(64)]
    pts = (pts * (n // len(pts) + 1))[:n]
    basis = V3.DeviceBasisV3(ck, pts, cap=cap)
    assert basis.all_z1
    scalars = [rng.randrange(VESTA.order) for _ in range(n)]
    scalars[0] = 0                              # zero scalar stays excluded
    scb = np.zeros((basis.n2, 32), np.uint8)
    scb[:n] = V3.scalars_to_bytes(scalars, VESTA.order)
    scb3 = jnp.asarray(scb.reshape(basis.n_chunks, basis.cap, 32))
    padd3 = V3._padd3(ck, use_fused=False)
    chunk = V3._chunk_prefixes(ck, basis.cap, padd3, fused_tree=True)
    acc = jnp.broadcast_to(basis.ident_soa[:, :, None, None],
                           (3, limb.N, V3.N_WINDOWS, V3.DP))
    for c in range(basis.n_chunks):
        acc = chunk(basis.arr[c], scb3[c], acc)
    accs = np.asarray(V3._halve_digits(padd3, acc))
    got = V3.combine_windows(ck, accs)
    assert got == VESTA.msm(scalars, pts)
