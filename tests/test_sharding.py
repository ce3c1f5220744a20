"""Multi-device sharding tests.

These run in SUBPROCESSES because (a) the virtual 8-device CPU flag must be
set before jax initializes, and (b) forcing it process-wide slows the whole
suite ~7x on this 1-core box (thread-pool oversubscription).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_subprocess(code: str, n_devices: int = 8, timeout: int = 560):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    env["PYTHONPATH"] = REPO
    preamble = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/nf_tpu_jax_cache')\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", preamble + code],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    return proc.stdout


def test_dryrun_multichip_8_devices():
    out = _run_subprocess(
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('DRYRUN_OK')\n"
    )
    assert "DRYRUN_OK" in out


def test_halo_particle_step_matches_replicated():
    out = _run_subprocess(
        "import numpy as np\n"
        "from neurofluid_tpu.parallel import dryrun\n"
        "ref, sh, rnn, snn, diag = dryrun.run_halo_particle_step(8)\n"
        "assert not diag['grid_overflow'], diag\n"
        "np.testing.assert_array_equal(rnn, snn)\n"
        "np.testing.assert_allclose(ref, sh, atol=1e-5)\n"
        "print('HALO_OK', np.abs(ref - sh).max())\n"
    )
    assert "HALO_OK" in out


def test_halo_insufficiency_is_flagged():
    """Fail-loudly contract: a halo too small for the boundary population
    (halo_size=2) must raise the overflow flag, never silently drop
    neighbors."""
    out = _run_subprocess(
        "from neurofluid_tpu.parallel import dryrun\n"
        "*_, diag = dryrun.run_halo_particle_step(8, halo_size=2)\n"
        "assert diag['grid_overflow'], diag\n"
        "print('HALO_FLAG_OK')\n"
    )
    assert "HALO_FLAG_OK" in out


def test_sharded_e2e_matches_single_device():
    out = _run_subprocess(
        "import numpy as np\n"
        "from neurofluid_tpu.parallel import dryrun\n"
        "a = dryrun.run_e2e_step(8, sharded=True)\n"
        "b = dryrun.run_e2e_step(8, sharded=False)\n"  # same shapes, no mesh\n
        "# different device counts change only reduction order\n"
        "assert abs(a['loss'] - b['loss']) < 1e-4, (a['loss'], b['loss'])\n"
        "np.testing.assert_allclose(a['next_pos'], b['next_pos'], atol=1e-5)\n"
        "print('MATCH_OK', a['loss'])\n"
    )
    assert "MATCH_OK" in out
