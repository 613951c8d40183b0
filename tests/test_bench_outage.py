"""bench.py outage behavior: a dead backend must produce ONE parseable JSON
line with rc=0, never a raw traceback (round-3 postmortem: BENCH_r03.json was
a 30-line RuntimeError dump because the axon tunnel died mid-round)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_structured_error_when_backend_hangs():
    env = os.environ.copy()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # simulate the tunnel-down HANG (not an exception) with a sleeping probe
    env["F5E_BENCH_PROBE_CODE"] = "import time; time.sleep(60)"
    env["F5E_BENCH_PROBE_TIMEOUT"] = "2"
    env["F5E_BENCH_NO_RETRY"] = "1"
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=120, env=env)
    assert r.returncode == 0, r.stderr
    line = r.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["error"] == "tpu_backend_unavailable"
    assert rec["value"] is None and rec["metric"].startswith("rtf_nfe")


def test_bench_probe_ok_path():
    env = os.environ.copy()
    env["F5E_BENCH_PROBE_CODE"] = "print('ok')"
    sys.path.insert(0, REPO)
    try:
        import importlib

        import bench

        importlib.reload(bench)
        old = os.environ.get("F5E_BENCH_PROBE_CODE")
        os.environ["F5E_BENCH_PROBE_CODE"] = "print('ok')"
        try:
            assert bench._probe_backend(timeout_s=30)
        finally:
            if old is None:
                os.environ.pop("F5E_BENCH_PROBE_CODE", None)
            else:
                os.environ["F5E_BENCH_PROBE_CODE"] = old
    finally:
        sys.path.remove(REPO)
