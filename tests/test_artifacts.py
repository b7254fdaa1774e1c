"""Artifact codec security tests: data-only decoding, fuzzed inputs,
strict point decompression, generator-cache integrity.

The reference relies on bincode's data-only property (main.rs:36-39); these
tests pin the same property for our codec: no byte stream can execute code,
malformed bytes reject cleanly, and points/generators from disk are
validated before use."""

import os

import pytest

from reef_tpu.backend.commitment import (EqualityProof, HyraxCommitment,
                                         SigmaEvalProof, _cached_gens)
from reef_tpu.backend.ipa import IpaProof
from reef_tpu.ec.pasta import PALLAS, VESTA
from reef_tpu.errors import DecodeError, VerifyError
from reef_tpu.utils import serialize as SZ


def test_roundtrip_primitives():
    for obj in (None, True, False, 0, 1, -1, 2**255 - 19, -(2**254),
                b"", b"\x00\xff", "", "héllo", [], [1, [2, [3]]],
                (), (1, 2), [None, True, (b"x", "y", [-5])]):
        data = SZ.dumps("t", obj)
        assert SZ.loads(data, "t") == obj


def test_roundtrip_dataclasses():
    ipa = IpaProof(Ls=[(1, 0), (2, 1)], Rs=[(3, 0), (4, 1)],
                   a_final=123, rho_final=456)
    eq = EqualityProof(alpha=(7, 1), z=99)
    hy = HyraxCommitment(row_commits=[(5, 6), None], n_vars=3, l_left=1,
                         l_right=2)
    sg = SigmaEvalProof(A=(1, 1), B=(2, 0), z=[1, 2, 3], z_rho=4, z_B=5)
    for obj in (ipa, eq, hy, sg, [ipa, eq], (hy, None)):
        data = SZ.dumps("proof", obj)
        back = SZ.loads(data, "proof")
        assert back == obj or back.__dict__ == obj.__dict__


def test_kind_and_magic_checks():
    data = SZ.dumps("cmt", [1, 2, 3])
    with pytest.raises(DecodeError):
        SZ.loads(data, "proof")              # wrong kind
    with pytest.raises(DecodeError):
        SZ.loads(b"JUNK" + data, "cmt")      # bad magic
    with pytest.raises(DecodeError):
        SZ.loads(data[:-1], "cmt")           # truncated (checksum)
    # bit flip anywhere -> checksum mismatch
    flipped = bytearray(data)
    flipped[len(data) // 2] ^= 0x40
    with pytest.raises(DecodeError):
        SZ.loads(bytes(flipped), "cmt")


def test_fuzz_malformed_bodies():
    """Structurally corrupt payloads (valid checksum) reject cleanly."""
    import hashlib
    import random
    rng = random.Random(1234)
    base = SZ.dumps("x", {1: 2} if False else [1, "a", (2, 3), None])
    body = base[:-16]
    for _ in range(300):
        mutated = bytearray(body)
        for _ in range(rng.randrange(1, 6)):
            mutated[rng.randrange(len(SZ.MAGIC) + 1, len(mutated))] = \
                rng.randrange(256)
        data = bytes(mutated) + hashlib.sha256(bytes(mutated)).digest()[:16]
        try:
            SZ.loads(data, "x")
        except DecodeError:
            pass                              # clean reject is the contract


def test_unknown_class_rejected():
    import hashlib
    import io
    out = io.BytesIO()
    out.write(SZ.MAGIC)
    SZ._w_varint(out, SZ.VERSION)
    SZ._encode(out, "k")
    out.write(b"\x08")
    SZ._encode(out, "os.system")   # hostile class name
    SZ._w_varint(out, 0)
    body = out.getvalue()
    with pytest.raises(DecodeError):
        SZ.loads(body + hashlib.sha256(body).digest()[:16], "k")


def test_decompress_strict():
    pt = PALLAS.mul(12345, PALLAS.gen)
    assert PALLAS.decompress(PALLAS.compress(pt)) == pt
    assert PALLAS.decompress((0, 2)) is None
    with pytest.raises(VerifyError):
        PALLAS.decompress((PALLAS.p, 0))          # x >= p
    with pytest.raises(VerifyError):
        PALLAS.decompress((pt[0], 3))             # bad flag
    with pytest.raises(VerifyError):
        PALLAS.decompress((1, 2))                 # non-canonical identity
    with pytest.raises(VerifyError):
        PALLAS.decompress("junk")                 # not a tuple
    # find a non-residue x
    x = 1
    while PALLAS.sqrt((x * x * x + 5) % PALLAS.p) is not None:
        x += 1
    with pytest.raises(VerifyError):
        PALLAS.decompress((x, 0))


def test_gens_cache_tamper_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    label, n = b"test/cache_tamper", 6
    honest = _cached_gens(VESTA, label, n)
    assert honest == VESTA.gens(label, n)
    cache_dir = tmp_path / ".cache" / "reef_tpu"
    files = list(cache_dir.glob("gens2_*.bin"))
    assert files, "cache file written"
    # tamper one coordinate and fix the checksum: spot-rederivation or
    # on-curve validation must reject and fall back to honest derivation
    # (clear the in-memory layer so the tampered FILE is actually re-read)
    import hashlib
    from reef_tpu.backend import commitment as CM
    raw = files[0].read_bytes()
    body = bytearray(raw[:-32])
    body[3] ^= 0x01
    files[0].write_bytes(bytes(body) + hashlib.sha256(bytes(body)).digest())
    CM._GENS_MEM.pop((VESTA.name, label), None)
    again = _cached_gens(VESTA, label, n)
    assert again == honest


def test_packed_int_lists_roundtrip():
    """Long non-negative int vectors take the packed fixed-width path
    (tag 0x09); type and values round-trip exactly at every width."""
    import random
    rng = random.Random(5)
    cases = [
        [rng.randrange(4) for _ in range(100)],            # width 1 (udoc)
        [rng.randrange(1 << 16) for _ in range(64)],       # width 2
        [rng.randrange(1 << 31) for _ in range(64)],       # width 4
        [rng.randrange(1 << 63) for _ in range(64)],       # width 8
        [rng.randrange(1 << 200) for _ in range(64)],      # width 25 (loop)
        tuple(rng.randrange(2**255) for _ in range(64)),   # width 32 tuple
        [0] * 100,                                         # all-zero
    ]
    for obj in cases:
        data = SZ.dumps("t", obj)
        back = SZ.loads(data, "t")
        assert back == obj and type(back) is type(obj)
    # mixed / negative / short lists stay on the per-element path
    for obj in ([1, -2, 3] * 30, [1, None] * 40, [2, 3]):
        assert SZ.loads(SZ.dumps("t", obj), "t") == obj


def test_packed_int_list_noncanonical_width_rejected():
    """A hand-built packed list whose width is wider than its maximum
    element must be rejected (one value, one encoding)."""
    import hashlib
    import io
    from reef_tpu.utils.serialize import MAGIC, VERSION, _w_varint
    out = io.BytesIO()
    out.write(MAGIC)
    _w_varint(out, VERSION)
    out.write(b"\x05\x01t")                      # kind str "t"
    out.write(b"\x09\x00")                       # packed list
    _w_varint(out, 2)                            # width 2 (too wide)
    _w_varint(out, 64)
    out.write(bytes([1, 0]) * 64)                # all fit in width 1
    body = out.getvalue()
    data = body + hashlib.sha256(body).digest()[:16]
    with pytest.raises(Exception):
        SZ.loads(data, "t")
