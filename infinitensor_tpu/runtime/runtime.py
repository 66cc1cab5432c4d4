"""Device runtimes.

Thin analog of the reference's RuntimeObj hierarchy (reference
include/core/runtime.h:38-136): on TPU the real "runtime" work — streams,
workspaces, kernel dispatch, memory planning — is owned by XLA/PJRT, so a
Runtime here is a device handle + executor factory + communicator config.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax


@dataclasses.dataclass
class Runtime:
    platform: str                     # "tpu" | "cpu"
    device_index: int = 0
    # Distributed config (reference initComm, src/cuda/cuda_runtime.cc:495):
    # on TPU, rendezvous is jax.distributed.initialize, not an id file.
    world_size: int = 1
    rank: int = 0

    @property
    def device(self):
        devs = [d for d in jax.devices() if d.platform == self.platform] \
            or jax.devices()
        return devs[self.device_index % len(devs)]

    def is_cpu(self) -> bool:
        return self.platform == "cpu"

    def executor(self, graph, **kwargs):
        from infinitensor_tpu.runtime.executor import GraphExecutor
        return GraphExecutor(graph, device=self.device, **kwargs)

    def run(self, graph, inputs=None, **kwargs):
        return self.executor(graph).run(inputs, **kwargs)

    def init_comm(self, name: str, world_size: int, rank: int,
                  coordinator: Optional[str] = None) -> None:
        """Multi-host bootstrap (replaces the NCCL id-file rendezvous,
        reference include/cuda/nccl_communicator.h:27-51)."""
        self.world_size, self.rank = world_size, rank
        if coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=world_size, process_id=rank)


def cpu_runtime() -> Runtime:
    return Runtime("cpu")


def tpu_runtime(device_index: int = 0) -> Runtime:
    return Runtime("tpu", device_index)


def default_runtime() -> Runtime:
    return Runtime(jax.default_backend())
