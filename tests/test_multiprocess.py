"""True multi-process `jax.distributed` test on localhost CPU.

SURVEY.md §4.4: "Multi-host logic additionally testable with
`jax.distributed` multi-process CPU on localhost." Two OS processes, 4
virtual CPU devices each, form one 8-device global mesh; each runs the
same SPMD `ShardedSolver` program (tests/mp_child.py) and asserts
sharded == single-controller to fp64 tolerance. This is the environment
where a global ``device_put``/``device_get`` on non-addressable shards
throws — the exact failure mode the ``_to_global``/``_to_host`` helpers
in parallel/sharded.py exist to prevent.
"""
import os
import socket
import subprocess
import sys

import pytest

_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_solve():
    port = _free_port()
    env = dict(os.environ)
    # The children set their own XLA_FLAGS/platform; scrub the parent's
    # 8-device flag so each child gets exactly 4 local devices.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_DIR, "mp_child.py"),
             str(port), "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process children timed out:\n"
                    + "\n---\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out}"
        assert "MP_OK" in out, f"child {pid} produced no MP_OK:\n{out}"
