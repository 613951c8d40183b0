"""True multi-process exercise of parallel/multihost.py.

Every other distributed proof in the suite is single-process on a virtual
mesh; this launches TWO OS processes coordinated over localhost via
jax.distributed, so initialize / split_between_processes / barrier /
broadcast_from_host0 / a pjit reduction actually cross a process boundary.

reference analogues: multi-node Accelerate DDP setup (model/trainer.py:63-68),
eval prompt splitting across processes (eval/eval_infer_batch.py:187).
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_jax_distributed_smoke():
    coord = f"127.0.0.1:{_free_port()}"
    env = os.environ.copy()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers pick CPU via jax.config; scrub inherited XLA device forcing
    env.pop("XLA_FLAGS", None)
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, WORKER, coord, "2", str(i)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env)
            for i in range(2)
        ]
    except OSError as e:  # runner cannot spawn
        pytest.skip(f"cannot spawn subprocesses: {e}")
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out; outputs so far: "
                    + "\n---\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}\n{out}"
        assert f"MULTIHOST_OK proc={i}" in out, out
