"""Driver-entry-point regression tests.

Round 1 shipped a ``dryrun_multichip`` that queried ``jax.default_backend()`` before switching
platforms, which initialized the host's force-registered axon TPU backend and failed in the
driver environment (MULTICHIP_r01.json ok:false). These tests run the entry points in FRESH
subprocesses WITHOUT the conftest's pre-forced CPU env, so an init-order regression fails here
instead of in the driver.

Reference capability being guarded: DDP training, scripts/train_denoiser.sh:6-7.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Env WITHOUT the CPU-forcing vars conftest sets — as the driver would call us."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # strip the host_platform_device_count flag conftest injects
    flags = env.get("XLA_FLAGS", "")
    kept = [f for f in flags.split() if "host_platform_device_count" not in f]
    if kept:
        env["XLA_FLAGS"] = " ".join(kept)
    else:
        env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_fresh_subprocess():
    """dryrun_multichip(8) must pass with NO env prep by the caller (the round-1 failure)."""
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_clean_env(),
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "OK" in proc.stdout


def test_bench_help_smoke():
    """bench.py must at least import + parse args outside the conftest env."""
    proc = subprocess.run(
        [sys.executable, "bench.py", "--help"], cwd=REPO, env=_clean_env(),
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
