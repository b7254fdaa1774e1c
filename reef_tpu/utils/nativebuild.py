"""Shared g++ build for the native libraries (msm / fieldvec / solver).

One place decides the flag set, so the three .so files can never drift to
different codegen.  The BMI2/ADX fast-path flags are only added when
/proc/cpuinfo advertises the features (a -madx binary SIGILLs at first
call on pre-Broadwell x86-64, and the flags are unknown options on other
architectures); any build failure retries once with the conservative
flag set before giving up.
"""

from __future__ import annotations

import os
import subprocess
from typing import List, Optional

_BASE = ["-O3", "-funroll-loops", "-shared", "-fPIC", "-std=c++17"]


def _cpu_fast_flags() -> List[str]:
    try:
        with open("/proc/cpuinfo") as fh:
            info = fh.read()
        flags_lines = [ln for ln in info.splitlines()
                       if ln.startswith("flags")]
        feats = set(flags_lines[0].split(":", 1)[1].split()) \
            if flags_lines else set()
        out = []
        if "bmi2" in feats:
            out.append("-mbmi2")
        if "adx" in feats:
            out.append("-madx")
        if {"avx512ifma", "avx512f", "avx512dq",
                "avx512vl"} <= feats:
            # enables the 8-wide 5x52 Montgomery bucket phase in msm.cpp
            out += ["-mavx512f", "-mavx512dq", "-mavx512vl",
                    "-mavx512ifma"]
        return out
    except Exception:
        return []


def build_native_lib(src: str, so: str,
                     extra: Optional[List[str]] = None) -> None:
    """(Re)build `so` from `src` if missing or stale; raises on failure."""
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(src)):
        return
    extra = list(extra or [])
    for flags in (_BASE + _cpu_fast_flags() + extra, _BASE + extra):
        try:
            subprocess.run(["g++", *flags, src, "-o", so],
                           check=True, capture_output=True)
            return
        except Exception:
            continue
    # final attempt, letting the exception propagate with stderr attached
    subprocess.run(["g++", *_BASE, *extra, src, "-o", so],
                   check=True, capture_output=True)
