"""Versioned artifact serialization (.cmt / .cmtkey / .proof files).

The reference bincode-serializes commitment and proof artifacts
(main.rs:36-39, 95-108).  Here artifacts are pickled with a version/type
header; `load` validates both before unpickling.  Artifacts are
self-describing python dataclasses from backend.{framework,commitment}.
"""

from __future__ import annotations

import pickle

MAGIC = b"REEF_TPU_ARTIFACT"
VERSION = 1


def save(path: str, kind: str, obj) -> int:
    data = pickle.dumps({"magic": MAGIC, "version": VERSION, "kind": kind,
                         "payload": obj}, protocol=4)
    with open(path, "wb") as fh:
        fh.write(data)
    return len(data)


def load(path: str, kind: str):
    with open(path, "rb") as fh:
        try:
            data = pickle.loads(fh.read())
        except Exception as e:
            raise ValueError(f"{path}: corrupt or unreadable artifact "
                             f"({type(e).__name__})") from None
    assert data.get("magic") == MAGIC, f"{path}: not a reef_tpu artifact"
    assert data.get("version") == VERSION, f"{path}: version mismatch"
    assert data.get("kind") == kind, (
        f"{path}: expected {kind}, got {data.get('kind')}")
    return data["payload"]
