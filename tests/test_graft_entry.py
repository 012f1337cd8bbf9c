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


def test_bench_backend_outage_emits_parseable_json():
    """With the backend probe forced to fail, bench.py must print ONE parseable JSON line
    with backend_unavailable=true and exit 0 — never a raw traceback (VERDICT r3 #2;
    BENCH_r03.json was rc=1 with parsed:null when the axon tunnel died)."""
    import json

    env = _clean_env()
    env.update({
        "PFPP_BENCH_PROBE_CMD": "exit 1",  # kill-the-backend simulation
        "PFPP_BENCH_PROBE_RETRIES": "2",
        "PFPP_BENCH_PROBE_SLEEP": "0.05",
        "PFPP_BENCH_PROBE_TIMEOUT": "5",
    })
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one output line, got: {proc.stdout!r}"
    rec = json.loads(lines[0])
    assert rec["backend_unavailable"] is True
    assert rec["metric"] == "assemblies_per_sec_per_chip"
    assert rec["value"] == 0.0
    assert "error" in rec


def test_bench_backend_probe_timeout_path():
    """A HUNG (not failing) backend init must also yield the parseable outage record —
    this is the actual r3 failure mode (jax.devices() blocking forever in the tunnel)."""
    import json

    env = _clean_env()
    env.update({
        "PFPP_BENCH_PROBE_CMD": "sleep 30",
        "PFPP_BENCH_PROBE_RETRIES": "1",
        "PFPP_BENCH_PROBE_SLEEP": "0",
        "PFPP_BENCH_PROBE_TIMEOUT": "1",
    })
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["backend_unavailable"] is True
    assert "timed out" in rec["error"]


def test_aot_fingerprint_covers_runtime_identity():
    """_code_fingerprint must change when the runtime identity (device kind / PJRT /
    libtpu build) changes, so a libtpu upgrade can never load a stale AOT executable
    (VERDICT r3 weak #4 / ADVICE r3 #4)."""
    code = """
import sys
sys.path.insert(0, %r)
import jax
jax.config.update('jax_platforms', 'cpu')
import bench
rid = bench._runtime_id()
assert len(rid) >= 3, rid                      # jax version, device kind, platform build
assert rid[0] == jax.__version__, rid
assert rid[1] not in ('', 'no-device'), rid    # a real device kind string
fp1 = bench._code_fingerprint(('shapes',))
fp2 = bench._code_fingerprint(('other-shapes',))
assert fp1 != fp2
bench._runtime_id = lambda: ('other-runtime',)
fp3 = bench._code_fingerprint(('shapes',))
assert fp3 != fp1, 'fingerprint must depend on the runtime identity'
print('FP_OK', rid)
""" % REPO
    env = _clean_env()
    env["JAX_PLATFORMS"] = "cpu"  # skip the backend probe; config update pins the platform
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "FP_OK" in proc.stdout
