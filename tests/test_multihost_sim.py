"""Simulated multi-host: 2 processes x 4 virtual CPU devices each.

Executes the REAL multi-process stack — `jax.distributed.initialize`
over a Gloo coordinator (`parallel.mesh.init_distributed`), the
host-major mesh (`make_mesh_multihost`), and the sharded dp train step
with cross-process collectives — the path a TPU pod slice uses, minus
ICI.  The reference has no distributed code at all (SURVEY.md §2.7).
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_process(modes: str, timeout: int = 420) -> list[str]:
    port = _free_port()
    cmd = [sys.executable, os.path.join(REPO, "scaling_bench.py"),
           "--multihost", "--platform", "cpu", "--devices", "8",
           "--local_devices", "4", "--modes", modes,
           "--steps", "2", "--warmup", "1",
           "--width", "64", "--height", "64", "--splats", "512"]
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid))
        env.pop("XLA_FLAGS", None)  # each process forces its own count
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    return outs


@pytest.mark.skipif(os.environ.get("SKIP_MULTIHOST") == "1",
                    reason="multihost simulation disabled")
def test_two_process_dp_step_runs():
    for out in _run_two_process("dp"):
        assert '"mode": "dp", "devices": 8' in out, out[-3000:]
        assert '"pass": true' in out, out[-3000:]


@pytest.mark.skipif(os.environ.get("SKIP_MULTIHOST") == "1",
                    reason="multihost simulation disabled")
def test_two_process_sharded_modes_run():
    """Cross-process collectives for every sharded mode beyond dp in ONE
    2-process spawn (one startup, four compiles): tile all_gather, tp
    instance all-to-all, TP x PBR (env-SH/gamma pmean + routed render
    equation), rays psum — VERDICT r4 item 7."""
    for out in _run_two_process("tile,tp,tp_pbr,rays", timeout=900):
        for mode in ("tile", "tp", "tp_pbr", "rays"):
            assert f'"mode": "{mode}", "devices": 8' in out, \
                (mode, out[-3000:])
