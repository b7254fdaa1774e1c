"""Log-round inner-product argument (Bulletproofs-style, with blinds).

The reference's evaluation engine (nova's ipa_pc, used inside Hyrax eval
proofs and Spartan, commitment.rs:24-26).  Relation proven:

    C_w = <w, G> + rho*H          (vector commitment, blinded)
    C_v = v*G_s + r_v*H           (scalar commitment, blinded)
    <w, R> = v                    (R public)

Protocol: combine P = C_w + tau*C_v for a transcript challenge tau, giving a
commitment with G_s-coefficient tau*v; run log2(n) halving rounds with
blinded cross terms L/R; finally open the folded scalar and blind.  v itself
is never revealed (the final scalars reveal only challenge-folded
combinations, matching the reference's hiding level).

Verifier cost: one O(n) MSM for the folded basis (s-vector trick) + O(log n)
group ops.  Proof size: 2*log2(n) points + 2 scalars.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass
from typing import List, Tuple

from ..ec.pasta import PALLAS, Point
from ..ops import field as F
from .commitment import PedersenGens, Transcript

f = F.FQ
cv = PALLAS


@dataclass
class IpaProof:
    Ls: List[Tuple[int, int]]
    Rs: List[Tuple[int, int]]
    a_final: int
    rho_final: int


def _absorb_setup(t: Transcript, C_w: Point, C_v: Point, R_pub: List[int]):
    t.append_point(b"C_w", cv, C_w)
    t.append_point(b"C_v", cv, C_v)
    t.append(b"R", R_pub)
    return t.challenge(b"ipa_tau", cv.order)


def ipa_prove(gens: PedersenGens, G_s: Point, w: List[int], rho: int,
              R_pub: List[int], v: int, r_v: int, C_w: Point, C_v: Point,
              t: Transcript) -> IpaProof:
    p = f.p
    n = len(w)
    assert n & (n - 1) == 0 and len(R_pub) == n
    tau = _absorb_setup(t, C_w, C_v, R_pub)

    G = list(gens.G[:n])
    H = gens.H
    w = [x % p for x in w]
    R = [x % p for x in R_pub]
    rho_p = (rho + tau * r_v) % p

    Ls, Rs = [], []
    while n > 1:
        half = n // 2
        w_lo, w_hi = w[:half], w[half:]
        R_lo, R_hi = R[:half], R[half:]
        G_lo, G_hi = G[:half], G[half:]
        r_L = secrets.randbelow(p)
        r_R = secrets.randbelow(p)
        cL = sum(a * b for a, b in zip(w_lo, R_hi)) % p
        cR = sum(a * b for a, b in zip(w_hi, R_lo)) % p
        L = cv.add(cv.add(cv.msm(w_lo, G_hi), cv.mul(tau * cL % p, G_s)),
                   cv.mul(r_L, H))
        Rp = cv.add(cv.add(cv.msm(w_hi, G_lo), cv.mul(tau * cR % p, G_s)),
                    cv.mul(r_R, H))
        Ls.append(cv.compress(L))
        Rs.append(cv.compress(Rp))
        t.append(b"L", list(cv.compress(L)))
        t.append(b"R", list(cv.compress(Rp)))
        x = t.challenge(b"ipa_x", cv.order)
        xi = pow(x, -1, p)
        w = [(x * a + xi * b) % p for a, b in zip(w_lo, w_hi)]
        R = [(xi * a + x * b) % p for a, b in zip(R_lo, R_hi)]
        try:
            from ..ec.native_msm import fold_points_native
            G = fold_points_native(cv, xi, x, G_lo, G_hi)
        except RuntimeError:
            G = [cv.add(cv.mul(xi, a), cv.mul(x, b))
                 for a, b in zip(G_lo, G_hi)]
        rho_p = (x * x % p * r_L + rho_p + xi * xi % p * r_R) % p
        n = half

    return IpaProof(Ls, Rs, w[0], rho_p)


def ipa_verify(gens: PedersenGens, G_s: Point, R_pub: List[int],
               C_w: Point, C_v: Point, proof: IpaProof,
               t: Transcript) -> bool:
    p = f.p
    n = len(R_pub)
    if n & (n - 1) or len(proof.Ls) != n.bit_length() - 1:
        return False
    tau = _absorb_setup(t, C_w, C_v, R_pub)

    xs = []
    for Lc, Rc in zip(proof.Ls, proof.Rs):
        t.append(b"L", list(Lc))
        t.append(b"R", list(Rc))
        xs.append(t.challenge(b"ipa_x", cv.order))

    # folded basis coefficients: s_i = prod_k x_k^{(+-1 by bit)}
    # round k splits on bit (log n - 1 - k) of the index; hi half gets x_k
    logn = len(xs)
    s = [1] * n
    for i in range(n):
        acc = 1
        for k in range(logn):
            bit = (i >> (logn - 1 - k)) & 1
            acc = acc * (xs[k] if bit else pow(xs[k], -1, p)) % p
        s[i] = acc
    G_final = cv.msm(s, gens.G[:n])
    # R folds with the same x^{-1}/x pattern as G: R_final = <s, R>
    R_final = sum(si * ri % p for si, ri in zip(s, R_pub)) % p

    # P_final = sum x_k^2 L_k + (C_w + tau C_v) + sum x_k^{-2} R_k
    P = cv.add(C_w, cv.mul(tau, C_v))
    for x, Lc, Rc in zip(xs, proof.Ls, proof.Rs):
        P = cv.add(P, cv.mul(x * x % p, cv.decompress(Lc)))
        P = cv.add(P, cv.mul(pow(x, -2, p), cv.decompress(Rc)))

    a = proof.a_final % p
    rhs = cv.add(cv.add(cv.mul(a, G_final),
                        cv.mul(tau * a % p * R_final % p, G_s)),
                 cv.mul(proof.rho_final, gens.H))
    return P == rhs
