"""Multi-host scaffold smoke test: a real 2-process ``jax.distributed``
run of the pairs-axis batch mode on CPU (SURVEY.md §5 distributed plan;
the subprocess pattern stands in for two hosts exactly as the virtual
8-device mesh stands in for a TPU slice, SURVEY.md §4)."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_job(control_path=None, expect_rc=0, timeout=600):
    """Launch one 2-process jax.distributed job; return {pid: out-json}
    (or {} when a nonzero exit is expected — crashed workers print
    nothing)."""
    coordinator = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__),
                          "_distributed_worker.py")

    env = dict(os.environ)
    # one virtual CPU device per process (the worker re-forces this via
    # distributed.initialize); drop the parent suite's 8-device flag
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(worker))
    env["PYTHONPATH"] = repo_root + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid),
             control_path or "-"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True)
        for pid in range(2)]
    outs = {}
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == expect_rc, \
            f"worker rc={p.returncode} (want {expect_rc}):\n{err[-3000:]}"
        if expect_rc == 0:
            o = json.loads(out.strip().splitlines()[-1])
            outs[o["pid"]] = o
    return outs


@pytest.mark.slow
def test_two_process_register_batch():
    by_pid = _spawn_job()
    assert set(by_pid) == {0, 1}
    # replicated outputs: both processes hold identical results
    assert by_pid[0]["scores"] == by_pid[1]["scores"]
    for s, imp in zip(by_pid[0]["scores"], by_pid[0]["improved"]):
        assert imp
        assert s > 0.8, s


@pytest.mark.slow
def test_two_process_crash_resume(tmp_path):
    """Fault-tolerant per-host resume: a 2-process job is hard-killed
    (os._exit) after one device step — its per-step ``on_checkpoint``
    state survives on disk — and a FRESH 2-process job resuming from
    that state completes the search (SURVEY.md §5 failure-detection /
    checkpoint-resume analog, scaled to the distributed batch mode)."""
    state_path = str(tmp_path / "batch_state.json")
    control1 = tmp_path / "control1.json"
    control1.write_text(json.dumps(
        {"die_after_steps": 1, "state_path": state_path}))
    outs = _spawn_job(str(control1), expect_rc=3)
    assert outs == {}          # both processes died before printing

    # every host wrote an identical replica of the checkpoint
    with open(state_path + ".0") as fh:
        state = json.load(fh)
    with open(state_path + ".1") as fh:
        assert json.load(fh) == state
    assert state["step_idx"] >= 1

    control2 = tmp_path / "control2.json"
    control2.write_text(json.dumps({"resume_state": state}))
    by_pid = _spawn_job(str(control2))
    assert set(by_pid) == {0, 1}
    assert by_pid[0]["scores"] == by_pid[1]["scores"]
    assert by_pid[0]["trials"] > state["trial"]
    for s, imp in zip(by_pid[0]["scores"], by_pid[0]["improved"]):
        assert imp
        assert s > 0.8, s
