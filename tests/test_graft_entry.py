"""Tests for the driver-facing entry points in __graft_entry__.py.

The round-1 driver check failed because dryrun_multichip assumed enough
real devices existed; these tests call the shipped function itself (not
just the logic underneath) in both regimes:

- in-process, with the suite's forced 8-device virtual CPU platform
  (conftest.py), exercising the mesh/shard/step path directly;
- in a subprocess given only ONE visible device, exercising the
  self-provisioning re-exec branch the driver hits on a 1-chip host.
"""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow
def test_dryrun_multichip_in_process():
    # slow tier: the driver executes dryrun_multichip(8) itself at the
    # end of every round, so the default suite keeps only the cheaper
    # entry() compile check below
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    graft.dryrun_multichip(8)  # raises on any failure


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_devices():
    """The driver scenario: 1 visible device, dryrun_multichip(8) must
    spawn a virtual 8-device mesh itself instead of crashing."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=1"])
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "step ok" in proc.stdout


def test_entry_lowers_single_chip():
    """Fast default tier: trace + lower entry() to StableHLO (catches
    shape/trace/kernel-construction errors).  The full backend compile
    costs ~2 min on a 1-core CPU host and is covered twice elsewhere:
    the slow variant below and the driver's own per-round compile
    check."""
    fn, args = graft.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered.out_info is not None  # traced, shapes resolved


@pytest.mark.slow
def test_entry_compiles_single_chip():
    fn, args = graft.entry()
    out = jax.jit(fn).lower(*args).compile()
    assert out is not None
