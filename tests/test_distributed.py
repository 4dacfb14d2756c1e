"""Two-process ``jax.distributed`` integration test (VERDICT r1 item 4).

Spawns two real OS processes, each with 4 virtual CPU devices, forming a
global ``('frame'=2, 'ty'=4)`` mesh: ``initialize`` performs actual
coordinator handshaking, ``shard_work_items`` splits the work list, and
``batched_coarse2fine_flow`` runs over the multi-process mesh with each
process validating its addressable shard against the single-device solve.
No TPU pod needed — this is the SURVEY.md §5.8 host-orchestration plan
exercised end-to-end on CPU.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

HERE = Path(__file__).resolve().parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_flow():
    port = _free_port()
    nprocs = 2
    env = dict(os.environ)
    # The workers configure their own XLA_FLAGS/JAX_PLATFORMS; scrub any
    # inherited device-count override from the pytest process.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(HERE / "_distributed_worker.py"),
             str(port), str(nprocs), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(HERE),
        )
        for pid in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DISTRIBUTED_OK pid={pid}" in out, out
