"""Sharded prover step over a jax.sharding.Mesh.

The reference's only parallelism is shared-memory rayon + a solver/prover
thread pipeline (SURVEY.md section 2c).  The TPU-native mapping shards the
batched field kernels over a device mesh:

  - Poseidon permutations: embarrassingly data-parallel over the batch axis;
  - sumcheck rounds: the T/eq tables shard over the `half` axis; the
    degree-2 coefficient sums are per-shard tree reductions combined with a
    modular psum (a psum over limb vectors would overflow lanes/limbs, so
    partial sums are all-gathered and added with carry propagation);
  - MSM: points shard over the batch axis; each device tree-reduces its
    points and partial results are all-gathered + point-added locally.

`sharded_prover_step(mesh)` returns a jitted function implementing one full
step (Poseidon batch + sumcheck round + MSM partial reduction) under
shard_map — this is the multi-chip path the driver dry-runs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.prover_step import _tree_sum
from ..ops import limb, poseidon
from ..ops.limb import FQ


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _allreduce_mod(lf, partial, axis):
    """Modular sum of per-device (N,) limb vectors: all_gather + sequential
    modular adds (psum would wrap lanes; adds carry-propagate per step)."""
    gathered = jax.lax.all_gather(partial, axis)      # (ndev, N)
    acc = gathered[0]
    for i in range(1, gathered.shape[0]):
        acc = limb.add(lf, acc, gathered[i])
    return acc


def sharded_prover_step(mesh: Mesh, axis: str = "data"):
    """One multi-chip prover step: sharded Poseidon + sumcheck + EC reduce."""
    lf = FQ

    from ..ec.msm import padd, vesta_kernels
    ck = vesta_kernels()
    ident = jnp.asarray(ck.ident)

    def local_step(states, t_tab, eq_tab, r, pts):
        # data-parallel Poseidon
        states = poseidon.permute(lf, states, 5)

        # sumcheck round on local table shards
        t0, t1 = t_tab[0], t_tab[1]
        e0, e1 = eq_tab[0], eq_tab[1]
        ts = limb.sub(lf, t1, t0)
        es = limb.sub(lf, e1, e0)
        xsq_p = _tree_sum(lf, limb.mul(lf, ts, es))
        x_p = _tree_sum(lf, limb.add(lf, limb.mul(lf, es, t0),
                                     limb.mul(lf, ts, e0)))
        con_p = _tree_sum(lf, limb.mul(lf, t0, e0))
        xsq = _allreduce_mod(lf, xsq_p, axis)
        x = _allreduce_mod(lf, x_p, axis)
        con = _allreduce_mod(lf, con_p, axis)
        rb = jnp.broadcast_to(r, t0.shape)
        t_fold = limb.add(lf, t0, limb.mul(lf, rb, ts))
        e_fold = limb.add(lf, e0, limb.mul(lf, rb, es))

        # EC partial reduction (MSM bucket-sum style): local reduce,
        # all-gather partials, reduce again.  fori_loop keeps ONE complete-add
        # body in the graph (an unrolled padd chain is pathological for the
        # CPU backend's compile time).
        def reduce_points(arr):
            def body(i, acc):
                return padd(ck, acc, arr[i])
            return jax.lax.fori_loop(1, arr.shape[0], body, arr[0])

        local = reduce_points(pts)
        parts = jax.lax.all_gather(local, axis)       # (ndev, 3, N)
        acc = reduce_points(parts)

        return states, t_fold, e_fold, xsq, x, con, acc

    fn = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(axis), P(None, axis), P(None, axis), P(None), P(axis)),
        out_specs=(P(axis), P(None, axis), P(None, axis), P(None), P(None),
                   P(None), P(None)),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_example_args(mesh: Mesh, batch_per_dev: int = 8,
                         half_per_dev: int = 8, pts_per_dev: int = 2):
    from ..ec.msm import vesta_kernels
    from ..ec.pasta import VESTA
    ndev = mesh.devices.size
    lf = FQ
    rng = np.random.default_rng(1)

    def rand(n):
        vals = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
        return lf.encode_host(vals)

    B = batch_per_dev * ndev
    H = half_per_dev * ndev
    states = jnp.asarray(rand(B * 5).reshape(B, 5, limb.N))
    t_tab = jnp.asarray(rand(2 * H).reshape(2, H, limb.N))
    eq_tab = jnp.asarray(rand(2 * H).reshape(2, H, limb.N))
    r = jnp.asarray(lf.encode_host(98765))
    ck = vesta_kernels()
    pts = [VESTA.mul(i + 2, VESTA.gen) for i in range(pts_per_dev * ndev)]
    pts_arr = jnp.asarray(ck.to_proj(pts))
    return states, t_tab, eq_tab, r, pts_arr
