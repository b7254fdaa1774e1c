"""Frozen Poseidon conformance vectors.

VERDICT r1 item #7: neptune's exact constant generation cannot be
re-derived in this environment (no crate source, no egress), so the
deviation is a documented waiver (README.md "Poseidon conformance") and
these vectors FREEZE the implemented constants — any accidental change to
the Grain-LFSR seed, MDS derivation, round counts, or sponge semantics
breaks proofs against previously-issued commitments, and breaks this test
first."""

from reef_tpu.ops import field as F
from reef_tpu.ops.poseidon import HostSponge, IOPattern
from reef_tpu.ops.poseidon_constants import host_permutation

VECTORS = {
    "FQ": {
        "perm_0": 0x362ba55bd8233ae8c55ac13bc64f8a17746d84cac88f85ad9fea36e96b8be740,
        "perm_1": 0x3d65b2dbb6874c2ffe21025701e3cafa3a9f1760f5dc74071c8f4668885d61e2,
        "sponge": 0x19b109b1ceb30bf45b4069efcd95283cf8742d070380471bbcafd6171e6145f3,
    },
    "FP": {
        "perm_0": 0x2b5fcc0d26105f3f6017ef5f7d9dc5ccdc8e1a22d9d60edf126b37acad689667,
        "perm_1": 0x2e821ca584a69c6c9cc57aba0f8b544b6cc35cf787dfe96c06f56c6f6bd34d38,
        "sponge": 0x080006087cdc8b82078b1ea6852ec0bc11591a6ff21691a1290c735bfee451bf,
    },
}


def test_frozen_vectors():
    for name, f in (("FQ", F.FQ), ("FP", F.FP)):
        out = host_permutation(f.p, [0, 1, 2, 3, 4])
        assert out[0] == VECTORS[name]["perm_0"], name
        assert out[1] == VECTORS[name]["perm_1"], name
        io = IOPattern([("absorb", 3), ("squeeze", 1)], domain=b"vector")
        sp = HostSponge(f, io)
        sp.absorb([7, 8, 9])
        assert sp.squeeze(1)[0] == VECTORS[name]["sponge"], name


def test_constants_cache_tamper_rederives(tmp_path, monkeypatch):
    """A tampered constants cache (valid sha, wrong constants) fails the
    pinned permutation digest and is silently replaced by a fresh
    derivation."""
    import hashlib
    import importlib
    monkeypatch.setenv("HOME", str(tmp_path))
    from reef_tpu.ops import field as F
    from reef_tpu.ops import poseidon_constants as PC
    PC.poseidon_params.cache_clear()
    honest = PC.poseidon_params(F.Q, 5)
    files = list((tmp_path / ".cache" / "reef_tpu").glob("posrc_*.bin"))
    assert files
    raw = files[0].read_bytes()
    body = bytearray(raw[:-32])
    body[5] ^= 1
    files[0].write_bytes(bytes(body) + hashlib.sha256(bytes(body)).digest())
    PC.poseidon_params.cache_clear()
    again = PC.poseidon_params(F.Q, 5)
    assert again == honest
