"""Poseidon Merkle document commitment (the -m mode).

Mirrors /root/reference/src/backend/merkle_tree.rs: leaves hash (idx, char)
pairs two-at-a-time with an arity-4 absorb [li, lc, ri, rc]; inner nodes
absorb [left, right].  Path witnesses carry the sibling (and at the leaf
level the sibling's (idx, char)) plus a left/right flag.

Device path: the whole tree builds as log2(n) batched Poseidon calls
(reef_tpu.ops.poseidon.hash_elems) — the per-level hashes are embarrassingly
parallel; the host path is the oracle.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..ops import field as F
from ..ops.poseidon import HostSponge, IOPattern


def _hash(vals: List[int]) -> int:
    io = IOPattern([("absorb", len(vals)), ("squeeze", 1)])
    sp = HostSponge(F.FQ, io)
    sp.absorb([v % F.Q for v in vals])
    return sp.squeeze(1)[0]


@dataclass
class MerkleWit:
    l_or_r: bool            # True: lookup is the LEFT element
    opposite_idx: Optional[int]
    opposite: int


class MerkleCommitment:
    def __init__(self, udoc: List[int]):
        self.doc = [v % F.Q for v in udoc]
        tree: List[List[int]] = []
        level = []
        for i in range(0, len(self.doc), 2):
            li, lc = i, self.doc[i]
            if i + 1 < len(self.doc):
                ri, rc = i + 1, self.doc[i + 1]
            else:
                ri, rc = 0, 0
            level.append(_hash([li, lc, ri, rc]))
        tree.append(level)
        while len(level) > 1:
            nxt = []
            for i in range(0, len(level), 2):
                l = level[i]
                r = level[i + 1] if i + 1 < len(level) else 0
                nxt.append(_hash([l, r]))
            tree.append(nxt)
            level = nxt
        self.tree = tree
        self.commitment = level[0]

    @property
    def height(self) -> int:
        """Number of path witnesses per lookup (leaf + inner levels)."""
        return len(self.tree)

    def path_wits(self, idx: int) -> List[MerkleWit]:
        assert idx < len(self.doc)
        out = []
        if idx % 2 == 0:
            opp_i = idx + 1
            opp = self.doc[opp_i] if opp_i < len(self.doc) else 0
            out.append(MerkleWit(True, opp_i if opp_i < len(self.doc) else 0,
                                 opp))
        else:
            out.append(MerkleWit(False, idx - 1, self.doc[idx - 1]))
        quo = idx // 2
        for h in range(len(self.tree) - 1):
            if quo % 2 == 0:
                opp = (self.tree[h][quo + 1]
                       if quo + 1 < len(self.tree[h]) else 0)
                out.append(MerkleWit(True, None, opp))
            else:
                out.append(MerkleWit(False, None, self.tree[h][quo - 1]))
            quo //= 2
        return out

    def make_wits(self, lookups: List[int]) -> List[List[MerkleWit]]:
        return [self.path_wits(q) for q in lookups]

    def verify_path(self, idx: int, char: int, wits: List[MerkleWit]) -> bool:
        """Host-side path check (out-of-circuit oracle)."""
        w = wits[0]
        if w.l_or_r:
            h = _hash([idx, char, w.opposite_idx, w.opposite])
        else:
            h = _hash([w.opposite_idx, w.opposite, idx, char])
        for w in wits[1:]:
            h = _hash([h, w.opposite]) if w.l_or_r else _hash([w.opposite, h])
        return h == self.commitment


_LEVEL_JITS = {}


def _leaf_jit():
    import jax
    from ..ops import limb, poseidon
    if "leaf" not in _LEVEL_JITS:
        _LEVEL_JITS["leaf"] = jax.jit(
            lambda arr: poseidon.hash_elems(limb.FQ, arr))
    return _LEVEL_JITS["leaf"]


def _pair_jit():
    import jax
    from ..ops import limb
    if "pair" not in _LEVEL_JITS:
        _LEVEL_JITS["pair"] = jax.jit(
            lambda pairs: _device_hash2(limb.FQ, pairs))
    return _LEVEL_JITS["pair"]


def build_tree_device(udoc: List[int]) -> int:
    """Batched device tree build; returns the root (bench path).

    Each level is one jitted batched Poseidon call over all nodes."""
    import jax.numpy as jnp
    import numpy as np
    from ..ops import limb, poseidon

    lf = limb.FQ
    n = len(udoc)
    idx_char = []
    for i in range(0, n, 2):
        ri = i + 1 if i + 1 < n else 0
        rc = udoc[i + 1] if i + 1 < n else 0
        idx_char.append([i, udoc[i], ri, rc])
    flat = [x for row in idx_char for x in row]
    arr = jnp.asarray(lf.encode(flat)).reshape(len(idx_char), 4, limb.N)
    level = _leaf_jit()(arr)                      # (n/2, N)
    while level.shape[0] > 1:
        m = level.shape[0]
        if m % 2:
            level = jnp.concatenate(
                [level, jnp.zeros((1, limb.N), jnp.uint32)])
            m += 1
        pairs = level.reshape(m // 2, 2, limb.N)
        level = _pair_jit()(pairs)
    return lf.decode(level[0])


def _device_hash2(lf, pairs):
    """Batched inner-node hash: absorb 2, squeeze 1 (matches host _hash)."""
    import jax.numpy as jnp
    from ..ops import limb, poseidon

    io = IOPattern([("absorb", 2), ("squeeze", 1)])
    tag = jnp.asarray(poseidon.tag_elem(lf, io))
    batch = pairs.shape[0]
    state = jnp.concatenate([
        jnp.broadcast_to(tag, (batch, 1, limb.N)),
        pairs,
        jnp.zeros((batch, 2, limb.N), jnp.uint32),
    ], axis=1)
    out = poseidon.permute(lf, state, 5)
    return out[:, 1, :]
