"""Graph-level optimizer: rewrites + PET/EinNet-style search (see search.py)."""

from infinitensor_tpu.optimizer.rewrite import optimize_graph

__all__ = ["optimize_graph"]
