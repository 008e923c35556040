"""Driver entry points must work even when the default backend is broken
or too small (MULTICHIP_r01 failed because jax.devices() raised at TPU
backend init before any CPU fallback could run)."""
import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip_direct():
    # conftest provides 8 virtual CPU devices → the direct path.
    graft.dryrun_multichip(8)


def test_dryrun_multichip_broken_default_backend(monkeypatch):
    """Simulate the libtpu-mismatch failure: jax.devices() raising must
    fall through to the CPU mesh, including all of _build()."""
    real_devices = jax.devices

    def broken_devices(platform=None):
        if platform is None:
            raise RuntimeError("simulated backend init failure")
        return real_devices(platform)

    monkeypatch.setattr(jax, "devices", broken_devices)
    graft.dryrun_multichip(4)


def test_dryrun_multichip_subprocess_force_cpu():
    """The re-exec path: a fresh interpreter with the force-CPU env var
    must complete without touching the default platform."""
    env = dict(os.environ)
    env["PMGT_TPU_DRYRUN_FORCE_CPU"] = "1"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    code = (
        f"import sys; sys.path.insert(0, {REPO!r}); "
        "import __graft_entry__ as g; g.dryrun_multichip(4)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(4): ok" in proc.stdout
