"""Two-process distributed bootstrap (VERDICT item 8): Runtime.init_comm ->
jax.distributed.initialize with a localhost coordinator, 2 CPU processes,
dp-sharded decode step with cross-process collectives (Gloo). This is the
code path BASELINE's 2-host scaling target depends on. Reference analog:
the thread-per-rank NCCL tests, test/kernels/cuda/test_cuda_all_reduce.cc:
38-50, and the id-file rendezvous nccl_communicator.h:27-51."""

import os
import socket
import subprocess
import sys

def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_decode():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "mp_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "PALLAS_AXON_POOL_IPS", "XLA_FLAGS",
                        "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, worker, str(r), str(port)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for r in range(2)]
    outs = []
    for r, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"rank {r} failed:\n{out}"
    for r, out in enumerate(outs):
        assert f"MP_OK rank={r}" in out, out
        assert f"MP_SERVE_OK rank={r}" in out, out


def test_two_process_tp8_paged_70b_layer_geometry():
    """Phase 3 (round-4 verdict item 5): tp=8 x dp=2 sharded paged-cache
    continuous batching at Llama-2-70B per-layer geometry, dp crossing
    the 2-process boundary; token parity vs a mesh-free engine."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "mp_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "PALLAS_AXON_POOL_IPS", "XLA_FLAGS",
                        "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["MP_PHASE3"] = "1"
    procs = [subprocess.Popen(
        [sys.executable, worker, str(r), str(port)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for r in range(2)]
    outs = []
    for r, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"
    for r, out in enumerate(outs):
        assert f"MP70B_OK rank={r}" in out, out[-4000:]
