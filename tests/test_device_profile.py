"""utils.device: the which-engine probe behind the "auto" offload gates.

On this CPU test platform the profile must be "cpu" (auto offload stays
host); the env override and the gate plumbing in witness/commitment are
checked directly.  The local-vs-remote latency branch itself can only be
exercised on accelerator hardware (bench.py / workloads drive it there).
"""

import importlib

import pytest


@pytest.fixture(autouse=True)
def _fresh_profile(monkeypatch):
    from reef_tpu.utils import device as D
    monkeypatch.setattr(D, "_PROFILE", None)
    yield
    D._PROFILE = None


def test_profile_cpu_on_cpu_platform():
    from reef_tpu.utils import device as D
    assert D.device_profile() == "cpu"      # jax imported, platform cpu
    assert D.accel_device_count() == 0


def test_profile_env_override(monkeypatch):
    from reef_tpu.utils import device as D
    monkeypatch.setenv("REEF_DEVICE_PROFILE", "local-accel")
    assert D.device_profile() == "local-accel"


def test_msm_auto_gate_follows_profile(monkeypatch):
    from reef_tpu.backend import commitment as CM
    from reef_tpu.utils import device as D
    monkeypatch.setenv("REEF_DEVICE_MSM", "auto")
    monkeypatch.setattr(D, "_PROFILE", "cpu")
    assert not CM._device_msm_on(1 << 16)
    # a local chip engages at fold shapes, but not below the min size
    monkeypatch.setattr(D, "_PROFILE", "local-accel")
    monkeypatch.setattr(D, "accel_device_count", lambda: 1)
    assert CM._device_msm_on(1 << 16)
    assert not CM._device_msm_on(CM.DEVICE_MSM_MIN_N - 1)
    # force-off / force-on still win over the profile
    monkeypatch.setenv("REEF_DEVICE_MSM", "0")
    assert not CM._device_msm_on(1 << 16)
    monkeypatch.setenv("REEF_DEVICE_MSM", "1")
    monkeypatch.setattr(D, "_PROFILE", "cpu")
    assert CM._device_msm_on(8)


def test_sumcheck_auto_stays_host_on_cpu(monkeypatch):
    """Default (auto) sumcheck offload must not engage on the cpu profile
    — and must not import jax into the decision for small tables."""
    monkeypatch.delenv("REEF_DEVICE_SUMCHECK", raising=False)
    from reef_tpu.backend.witness import WitnessGenerator
    from reef_tpu.utils import device as D
    monkeypatch.setattr(D, "_PROFILE", "cpu")
    wg = WitnessGenerator.__new__(WitnessGenerator)
    assert wg._maybe_device_cache("nl", list(range(1 << 15))) is None
