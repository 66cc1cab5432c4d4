from infinitensor_tpu.native.planner import (
    MemoryPlanner, plan_graph_memory, native_available,
)

__all__ = ["MemoryPlanner", "plan_graph_memory", "native_available"]
