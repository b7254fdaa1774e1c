"""Poseidon round constants + MDS matrix generation (host, pure Python).

Follows the Poseidon paper's reference parameter generation
(`generate_parameters_grain.sage`, poseidon-hash reference implementation),
the same scheme the reference's neptune crate derives its constants from
(neptune 8.1, used at /root/reference/src/backend/framework.rs:24-28 via
`Sponge::api_constants(Strength::Standard)`):

  - round constants from an 80-bit Grain LFSR seeded with the instance
    parameters (field tag, sbox tag, n, t, R_F, R_P), with von-Neumann style
    bit filtering and rejection sampling of n-bit candidates >= p;
  - MDS matrix as the Cauchy matrix M[i][j] = 1 / (x_i + y_j) with
    x_i = i, y_j = t + j.

Round numbers: full rounds R_F = 8 (neptune fixes this), partial rounds per
the paper's security analysis for alpha=5, 255-bit fields, M=128 — tabulated
below per width t.  The permutation is the vanilla (unoptimized) evaluation
order: add-round-constant -> S-box -> MDS each round; partial rounds S-box
only lane 0.  Constants are cached per (field, t).
"""

from __future__ import annotations

import functools

import numpy as np

from . import field as F

# Partial-round counts for alpha = 5, |F| ~ 2^255, M = 128 security, R_F = 8.
# (Poseidon paper Table 2 / calc_round_numbers.py; neptune uses the same.)
PARTIAL_ROUNDS = {2: 55, 3: 55, 4: 56, 5: 56, 6: 56, 7: 56, 8: 57, 9: 57,
                  10: 57, 11: 57, 12: 57, 13: 57, 14: 57, 15: 59, 16: 59,
                  17: 59, 25: 59, 37: 60, 65: 61}
FULL_ROUNDS = 8


class GrainLFSR:
    """80-bit Grain LFSR from the Poseidon reference implementation."""

    def __init__(self, field_tag: int, sbox_tag: int, n: int, t: int,
                 r_f: int, r_p: int):
        bits = []
        for val, width in [(field_tag, 2), (sbox_tag, 4), (n, 12), (t, 12),
                           (r_f, 10), (r_p, 10)]:
            bits += [(val >> i) & 1 for i in reversed(range(width))]
        bits += [1] * 30
        assert len(bits) == 80
        self.state = bits  # state[0] is the oldest bit (s_0 ... s_79)
        for _ in range(160):
            self._next_raw()

    def _next_raw(self) -> int:
        s = self.state
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        self.state = s[1:] + [new]
        return new

    def next_bit(self) -> int:
        # von-Neumann-ish filtering: a 1 bit says "emit the next raw bit"
        while True:
            if self._next_raw() == 1:
                return self._next_raw()
            self._next_raw()

    def next_field_element(self, p: int, n_bits: int) -> int:
        while True:
            v = 0
            for _ in range(n_bits):
                v = (v << 1) | self.next_bit()
            if v < p:
                return v


@functools.lru_cache(maxsize=None)
def poseidon_params(p: int, t: int):
    """(round_constants [(R_F+R_P)*t], mds [t][t]) as python-int tuples."""
    r_f = FULL_ROUNDS
    r_p = PARTIAL_ROUNDS[t]
    n = p.bit_length()
    grain = GrainLFSR(field_tag=1, sbox_tag=0, n=n, t=t, r_f=r_f, r_p=r_p)
    n_constants = (r_f + r_p) * t
    rc = tuple(grain.next_field_element(p, n) for _ in range(n_constants))
    xs = list(range(t))
    ys = [t + j for j in range(t)]
    mds = tuple(
        tuple(pow((x + y) % p, -1, p) for y in ys) for x in xs
    )
    return rc, mds


def host_permutation(p: int, state: list[int]) -> list[int]:
    """Reference (host-side, python-int) Poseidon permutation for width t."""
    t = len(state)
    rc, mds = poseidon_params(p, t)
    r_f, r_p = FULL_ROUNDS, PARTIAL_ROUNDS[t]
    half = r_f // 2
    s = [x % p for x in state]
    ci = 0

    def mix(s):
        return [sum(mds[i][j] * s[j] for j in range(t)) % p for i in range(t)]

    for _ in range(half):
        s = [(x + rc[ci + i]) % p for i, x in enumerate(s)]
        ci += t
        s = [pow(x, 5, p) for x in s]
        s = mix(s)
    for _ in range(r_p):
        s = [(x + rc[ci + i]) % p for i, x in enumerate(s)]
        ci += t
        s[0] = pow(s[0], 5, p)
        s = mix(s)
    for _ in range(half):
        s = [(x + rc[ci + i]) % p for i, x in enumerate(s)]
        ci += t
        s = [pow(x, 5, p) for x in s]
        s = mix(s)
    assert ci == len(rc)
    return s
