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


@pytest.mark.slow
def test_two_process_register_batch():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
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
            [sys.executable, worker, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    # replicated outputs: both processes hold identical results
    assert by_pid[0]["scores"] == by_pid[1]["scores"]
    for s, imp in zip(by_pid[0]["scores"], by_pid[0]["improved"]):
        assert imp
        assert s > 0.8, s
