"""DTensor-style placement lattice.

Mirrors the reference's placement types (reference examples/distributed/
placement.py:4-62: Replicate / Shard(dim) / _Partial(reduce_op)) used by the
TP planner. On TPU a placement maps onto a PartitionSpec entry; Partial
corresponds to a pending psum that GSPMD materializes.
"""

from __future__ import annotations

import dataclasses


class Placement:
    def is_replicate(self) -> bool:
        return isinstance(self, Replicate)

    def is_shard(self, dim=None) -> bool:
        return isinstance(self, Shard) and (dim is None or self.dim == dim)

    def is_partial(self) -> bool:
        return isinstance(self, Partial)


@dataclasses.dataclass(frozen=True)
class Replicate(Placement):
    def __repr__(self):
        return "Replicate()"


@dataclasses.dataclass(frozen=True)
class Shard(Placement):
    dim: int

    def __repr__(self):
        return f"Shard(dim={self.dim})"


@dataclasses.dataclass(frozen=True)
class Partial(Placement):
    reduce_op: str = "sum"

    def __repr__(self):
        return f"Partial({self.reduce_op})"


def to_partition_entry(p: Placement, axis_name: str, rank: int):
    """Placement -> PartitionSpec tuple for a tensor of given rank.
    Partial has no spec — the caller must insert an AllReduce first."""
    from jax.sharding import PartitionSpec as P

    if p.is_replicate():
        return P()
    if isinstance(p, Shard):
        dim = p.dim % rank
        entry = [None] * rank
        entry[dim] = axis_name
        return P(*entry)
    raise ValueError(f"cannot express {p} as a PartitionSpec")
