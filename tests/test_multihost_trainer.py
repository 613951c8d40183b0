"""Trainer.train() across a REAL process boundary (VERDICT r4 #6).

test_multihost.py proves initialize/split/barrier/pjit cross processes;
this proves the actual training loop does: two OS processes (2 CPU devices
each) run Trainer over a data=2 x fsdp=2 global mesh through (A) an
uninterrupted 6-update run, (B) a SIGTERM preemption at update 3 with a
collective orbax model_last save, and (C) a resume that must continue the
loss sequence BITWISE. Assertions live in tests/_multihost_trainer_worker.py.

reference analogue: multi-GPU Accelerate DDP training + resume
(src/f5_tts/model/trainer.py:63-68, 185-263).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_trainer_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_trainer_preempt_resume(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = os.environ.copy()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, WORKER, coord, "2", str(i), str(tmp_path)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env)
            for i in range(2)
        ]
    except OSError as e:
        pytest.skip(f"cannot spawn subprocesses: {e}")
    outs = []
    try:
        for p in procs:
            # three Trainer jit-compiles x 2 processes sharing ONE host CPU:
            # ~8 min uncontended on this box, worse when the suite runs
            # other tests in parallel
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost trainer workers timed out; outputs so far: "
                    + "\n---\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}\n{out}"
        assert f"MULTIHOST_TRAINER_OK proc={i}" in out, out
