"""Real multi-process exercise of the DCN eval-sharding path.

VERDICT r1 #8: `gather_host_results`' padded pickle allgather
(parallel/eval_sharding.py) must run with process_count > 1 at least once —
the single-process identity path cannot catch cross-host bugs. Two local
processes rendezvous via jax.distributed over localhost TCP on the CPU
backend (the same code path a multi-host TPU pod uses over DCN).
"""
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys, json, pickle

# one virtual CPU device per process, BEFORE jax import
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax
jax.config.update("jax_platforms", "cpu")

port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2

sys.path.insert(0, os.getcwd())  # launched with cwd = repo root
from sam_pt_tpu.parallel.eval_sharding import (
    gather_host_results, shard_videos_across_hosts,
)

videos = list(range(10))
mine = shard_videos_across_hosts(videos)
# strided slices: process 0 -> evens, process 1 -> odds
assert mine == videos[pid::2], (pid, mine)

# unequal payload sizes exercise the padding path
records = [{"video": v, "rank": pid, "blob": "x" * (100 + 300 * pid)}
           for v in mine]
merged = gather_host_results(records)
got = sorted(r["video"] for r in merged)
assert got == videos, got
assert {r["rank"] for r in merged} == {0, 1}

if pid == 0:
    with open(out_path, "w") as f:
        json.dump({"n": len(merged), "videos": got}, f)
print(f"proc {pid} ok")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_gather(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    # the worker adds its cwd (set to the repo root below) to sys.path
    out_path = tmp_path / "result.json"
    port = _free_port()

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid), str(out_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    import json

    result = json.loads(out_path.read_text())
    assert result["n"] == 10
    assert result["videos"] == list(range(10))
