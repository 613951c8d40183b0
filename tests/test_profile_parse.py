"""scripts/profile_duty.device_busy: perfetto-trace self-time aggregation.

The TPU device process emits NESTED op spans ("XLA Modules" wraps the whole
jit call; while.N wraps its body ops on the "XLA Ops" lane). Raw duration
sums double-count every scan body — the first round-4 train trace reported
op categories at 261% of device-busy. These tests lock the fixed contract:
only "XLA Ops" lanes count, per-op times are SELF times (parent minus
children), and the per-op totals sum exactly to the overlap-merged busy
time.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from profile_duty import device_busy  # noqa: E402


def _meta(pid, name):
    return {"ph": "M", "pid": pid, "name": "process_name",
            "args": {"name": name}}


def _thread(pid, tid, name):
    return {"ph": "M", "pid": pid, "tid": tid, "name": "thread_name",
            "args": {"name": name}}


def _span(pid, tid, name, ts, dur):
    return {"ph": "X", "pid": pid, "tid": tid, "name": name,
            "ts": ts, "dur": dur}


def test_nested_spans_report_self_time():
    # while.1 [0, 100us) contains fusion.1 [10, 40) and dot.1 [50, 90)
    trace = {"traceEvents": [
        _meta(3, "/device:TPU:0"), _meta(7, "/host:CPU"),
        _thread(3, 1, "Steps"), _thread(3, 2, "XLA Modules"),
        _thread(3, 3, "XLA Ops"), _thread(7, 9, "python"),
        _span(3, 2, "jit_step", 0, 100),          # module lane: ignored
        _span(3, 3, "while.1", 0, 100),
        _span(3, 3, "fusion.1", 10, 30),
        _span(3, 3, "dot.1", 50, 40),
        _span(7, 9, "host_thing", 0, 500),        # host: ignored
    ]}
    busy, per_op, pnames = device_busy(trace)
    assert abs(busy - 100e-6) < 1e-12
    assert abs(per_op["while.1"] - 30e-6) < 1e-12   # 100 - 30 - 40
    assert abs(per_op["fusion.1"] - 30e-6) < 1e-12
    assert abs(per_op["dot.1"] - 40e-6) < 1e-12
    assert abs(sum(per_op.values()) - busy) < 1e-12


def test_deep_nesting_and_gap_busy():
    # two top spans with a 100us idle gap between them; 3-level nesting
    trace = {"traceEvents": [
        _meta(3, "/device:TPU:0"),
        _thread(3, 3, "XLA Ops"),
        _span(3, 3, "while.outer", 0, 100),
        _span(3, 3, "while.inner", 10, 80),
        _span(3, 3, "fusion.leaf", 20, 60),
        _span(3, 3, "dot.late", 200, 50),
    ]}
    busy, per_op, _ = device_busy(trace)
    assert abs(busy - 150e-6) < 1e-12               # 100 + 50, gap excluded
    assert abs(per_op["while.outer"] - 20e-6) < 1e-12
    assert abs(per_op["while.inner"] - 20e-6) < 1e-12
    assert abs(per_op["fusion.leaf"] - 60e-6) < 1e-12
    assert abs(per_op["dot.late"] - 50e-6) < 1e-12
    assert abs(sum(per_op.values()) - busy) < 1e-12


def test_cpu_backend_fallback_without_named_lanes():
    # CPU traces have no "XLA Ops" thread names: all cpu-process lanes count
    trace = {"traceEvents": [
        _meta(1, "cpu"),
        _span(1, 5, "dot.1", 0, 40),
        _span(1, 5, "fusion.1", 60, 40),
    ]}
    busy, per_op, _ = device_busy(trace)
    assert abs(busy - 80e-6) < 1e-12
    assert abs(per_op["dot.1"] - 40e-6) < 1e-12
    assert abs(per_op["fusion.1"] - 40e-6) < 1e-12
