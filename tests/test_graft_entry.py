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


def test_aot_executable_checksum_validation(tmp_path):
    """_engine_call_aot must trust a deserialized executable ONLY after re-running the
    fixed-rng save-time call and matching host-materialized checksums. Round 4 observed
    deserialized executables through the axon tunnel returning never-computed buffers
    that block_until_ready treated as ready (1-3 ms 'runs' of a 0.7 s program, bogus
    15k assemblies/s); corrupted-checksum and legacy-format pickles must be rejected
    and recompiled, never timed. Runs in a fresh SINGLE-device CPU subprocess: under the
    conftest's 8 virtual devices, deserialized single-device executables cannot execute
    at all (execute_sharded shard-count error — itself caught by the rejected-load path)."""
    code = """
import pickle, types, glob
import sys
sys.path.insert(0, %r)
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
import bench
bench.__file__ = %r + '/bench.py'   # point the aot cache dir into tmp

@jax.jit
def fn(params, sample, rngs):
    return {'part_acc': jnp.tanh(sample['part_pcs'].sum(axis=(1, 2)) * params['w'])
            + 0.0 * rngs.sum()}

engine = types.SimpleNamespace(jitted=fn, params={'w': jnp.float32(2.0)})
sample = {'part_pcs': jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)}
rngs = jnp.ones((2,), jnp.float32)
cfg = types.SimpleNamespace(trainer=types.SimpleNamespace(precision='fp32'),
                            inference=types.SimpleNamespace(batch_size=2))
expect = np.asarray(fn(engine.params, sample, rngs)['part_acc'])

call, status = bench._engine_call_aot(engine, sample, rngs, cfg)
assert status == 'miss-saved', status
np.testing.assert_allclose(np.asarray(call(sample, rngs)['part_acc']), expect, rtol=1e-6)
pkls = glob.glob(%r + '/.jax_cache/aot/*.pkl')
assert len(pkls) == 1, pkls
with open(pkls[0], 'rb') as fh:
    blob = pickle.load(fh)
assert len(blob) == 4  # payload, in_tree, out_tree, checksum

# warm start: validation passes -> hit, and the callable computes real values
call2, status2 = bench._engine_call_aot(engine, sample, rngs, cfg)
assert status2 == 'hit', status2
np.testing.assert_allclose(np.asarray(call2(sample, rngs)['part_acc']), expect, rtol=1e-6)

# corrupt the stored checksum: must be rejected + recompiled/resaved, never trusted
with open(pkls[0], 'wb') as fh:
    pickle.dump((*blob[:3], [1e9 for _ in blob[3]]), fh)
_, status3 = bench._engine_call_aot(engine, sample, rngs, cfg)
assert status3 == 'rejected-validation-saved', status3

# legacy 3-tuple (pre-validation) pickles carry no proof: reject + resave
with open(pkls[0], 'rb') as fh:
    blob4 = pickle.load(fh)
assert len(blob4) == 4 and bench._checksums_close(blob4[3], blob4[3])
with open(pkls[0], 'wb') as fh:
    pickle.dump(blob4[:3], fh)
_, status4 = bench._engine_call_aot(engine, sample, rngs, cfg)
assert status4 == 'rejected-load-saved', status4
call5, status5 = bench._engine_call_aot(engine, sample, rngs, cfg)
assert status5 == 'hit', status5
print('AOT_VALIDATION_OK')
""" % (REPO, str(tmp_path), str(tmp_path))
    env = _clean_env()
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "AOT_VALIDATION_OK" in proc.stdout


def test_recorded_full_range_surfaced(tmp_path, monkeypatch):
    """main()'s BENCH JSON must carry the recorded --full-range figure (the honest
    3-20-part serving number) when evidence/bench/full_range.jsonl exists; errors and
    absence degrade to None, never an exception."""
    import json as _json

    import bench

    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._recorded_full_range() is None  # absent file

    ev = tmp_path / "evidence" / "bench"
    ev.mkdir(parents=True)
    (ev / "full_range.jsonl").write_text("not json\n")
    assert bench._recorded_full_range() is None  # unparseable

    recs = [
        {"error": "tunnel died"},
        {"metric": "serving_assemblies_per_sec_3to20_parts", "value": 7.5,
         "extra": {"n_shapes": 32}},
        {"metric": "serving_assemblies_per_sec_3to20_parts", "value": 8.1,
         "extra": {"n_shapes": 32}},
    ]
    (ev / "full_range.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in recs) + "\n")
    got = bench._recorded_full_range()
    assert got["value"] == 8.1  # most recent successful record wins
    assert got["n_shapes"] == 32
    assert got["metric"] == "serving_assemblies_per_sec_3to20_parts"
    assert "recorded_mtime_utc" in got


def _proc_state(pid):
    with open(f"/proc/{pid}/stat") as f:
        return f.read().rsplit(")", 1)[1].split()[0]


def test_pause_background_queue_stops_and_resumes(tmp_path, monkeypatch):
    """_pause_background_queue must SIGSTOP the whole pid-file process tree for the timed
    windows and SIGCONT it after — the driver's round-end bench would otherwise measure
    chip contention from a still-running evidence-queue training."""
    import time as _time

    import bench

    proc = subprocess.Popen(["bash", "-c", "sleep 30 & wait"])
    try:
        _time.sleep(0.3)  # let bash fork the sleep child
        pidfile = tmp_path / "queue.pid"
        pidfile.write_text(str(proc.pid))
        monkeypatch.setenv("PFPP_QUEUE_PIDFILE", str(pidfile))
        monkeypatch.delenv("PFPP_BENCH_NO_PAUSE", raising=False)
        def _await_states(pids, want_stopped, deadline_s=5.0):
            # SIGSTOP/SIGCONT state flips are asynchronous on a loaded host: poll
            t1 = _time.time() + deadline_s
            while _time.time() < t1:
                states = [_proc_state(p) for p in pids]
                if all((s == "T") == want_stopped for s in states):
                    return states
                _time.sleep(0.05)
            return states

        with bench._pause_background_queue() as pq:
            assert len(pq.stopped) >= 2, pq.stopped  # bash + its sleep child
            states = _await_states(pq.stopped, want_stopped=True)
            assert all(s == "T" for s in states), states
        states = _await_states(pq.stopped, want_stopped=False)
        assert all(s != "T" for s in states), states
    finally:
        proc.kill()
        proc.wait()


def test_pause_background_queue_guards(tmp_path, monkeypatch):
    """No-ops: missing/garbage pid file, a pid that is this process's own ancestor
    (stage C/D of the evidence queue run bench.py INSIDE the queue — self-stopping would
    deadlock), and the PFPP_BENCH_NO_PAUSE escape hatch."""
    import bench

    pidfile = tmp_path / "queue.pid"
    monkeypatch.setenv("PFPP_QUEUE_PIDFILE", str(pidfile))

    with bench._pause_background_queue() as pq:  # missing file
        assert pq.stopped == []
    pidfile.write_text("not-a-pid")
    with bench._pause_background_queue() as pq:  # garbage file
        assert pq.stopped == []

    pidfile.write_text(str(os.getppid()))  # our own ancestor: the queue case
    assert bench._pid_chain_contains(os.getppid())
    with bench._pause_background_queue() as pq:
        assert pq.stopped == []

    proc = subprocess.Popen(["sleep", "5"])
    try:
        pidfile.write_text(str(proc.pid))
        monkeypatch.setenv("PFPP_BENCH_NO_PAUSE", "1")
        with bench._pause_background_queue() as pq:
            assert pq.stopped == []
        assert _proc_state(proc.pid) != "T"
    finally:
        proc.kill()
        proc.wait()


def test_pause_watchdog_resumes_after_hard_kill(tmp_path):
    """If bench.py is SIGKILLed (driver timeout / host OOM) between __enter__ and
    __exit__, the detached watchdog must SIGCONT the paused queue tree — otherwise the
    multi-hour training would stay frozen for the rest of the round (stopped processes
    never exit, so the relaunch supervisor never fires)."""
    import time as _time

    tree = subprocess.Popen(["bash", "-c", "sleep 60 & wait"])
    try:
        _time.sleep(0.3)
        pidfile = tmp_path / "queue.pid"
        pidfile.write_text(str(tree.pid))
        code = (
            "import os, sys, time\n"
            f"sys.path.insert(0, {REPO!r})\n"
            "import bench\n"
            "ctx = bench._pause_background_queue()\n"
            "ctx.__enter__()\n"
            "print('STOPPED', len(ctx.stopped), flush=True)\n"
            "time.sleep(60)\n"  # hard-killed here; __exit__ never runs
        )
        env = dict(os.environ)
        env["PFPP_QUEUE_PIDFILE"] = str(pidfile)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PFPP_BENCH_NO_PAUSE", None)
        bench_proc = subprocess.Popen(
            [sys.executable, "-c", code], env=env, cwd=REPO,
            stdout=subprocess.PIPE, text=True,
        )
        try:
            line = bench_proc.stdout.readline()
            assert "STOPPED" in line and int(line.split()[1]) >= 2, line
            deadline = _time.time() + 5
            while _time.time() < deadline and _proc_state(tree.pid) != "T":
                _time.sleep(0.05)
            assert _proc_state(tree.pid) == "T"
        finally:
            bench_proc.kill()  # SIGKILL: no __exit__, watchdog must restore
            bench_proc.wait()
        deadline = _time.time() + 15
        while _time.time() < deadline and _proc_state(tree.pid) == "T":
            _time.sleep(0.2)
        assert _proc_state(tree.pid) != "T", "watchdog failed to SIGCONT after kill"
    finally:
        tree.kill()
        tree.wait()
