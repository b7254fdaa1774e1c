"""Device-profile probe: is the attached accelerator worth defaulting to?

The prover's device offloads (REEF_DEVICE_SUMCHECK / REEF_DEVICE_MSM,
witness.py / commitment.py) only win when per-dispatch latency is small:
at fold shapes the device MSM kernel beats the native host MSM by ~1.7x
(BENCHMARKS.md), so a locally-attached chip should be the DEFAULT engine —
but through a high-latency tunnel the per-call sync alone exceeds the host
MSM's entire runtime and host routing wins.  The reference has no analog
(single-process CPU Rust); this is the TPU-native "which engine" decision,
made once per process from a measured dispatch round-trip.

Classification (cached; override with REEF_DEVICE_PROFILE):
  "cpu"          — no accelerator backend (or jax not imported/available);
                   multi-device CPU test meshes also land here (tests force
                   engagement with the env gates)
  "local-accel"  — accelerator whose measured dispatch round-trip is under
                   REEF_LOCAL_DISPATCH_MS (default 25 ms): device offload
                   engages by default under "auto"
  "remote-accel" — accelerator behind a high-latency link (tunneled PJRT):
                   "auto" stays host; force with the =1 gates

The probe never imports jax into a jax-free process (a host-only CLI run
must stay jax-free: plugin registration alone costs ~2.2s), and runs at
most once per process.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

_PROFILE: Optional[str] = None


def _dispatch_ms() -> float:
    """Best-of-3 jitted-dispatch + host-sync round trip, in ms."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.int32)
    np.asarray(f(x))                       # compile + first transfer
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best


def device_profile() -> str:
    """One of "cpu" / "local-accel" / "remote-accel" (process-cached)."""
    global _PROFILE
    if _PROFILE is not None:
        return _PROFILE
    forced = os.environ.get("REEF_DEVICE_PROFILE")
    if forced in ("cpu", "local-accel", "remote-accel"):
        _PROFILE = forced
        return _PROFILE
    if "jax" not in sys.modules:           # keep jax-free processes jax-free
        _PROFILE = "cpu"
        return _PROFILE
    try:
        import jax
        devs = jax.devices()
        if devs[0].platform == "cpu":
            _PROFILE = "cpu"
        else:
            thresh = float(os.environ.get("REEF_LOCAL_DISPATCH_MS", "25"))
            _PROFILE = ("local-accel" if _dispatch_ms() <= thresh
                        else "remote-accel")
    except Exception:
        _PROFILE = "cpu"
    return _PROFILE


def accel_device_count() -> int:
    """Number of accelerator devices (0 on cpu profile)."""
    if device_profile() == "cpu":
        return 0
    try:
        import jax
        return len(jax.devices())
    except Exception:
        return 0
