from infinitensor_tpu.runtime.executor import GraphExecutor
from infinitensor_tpu.runtime.runtime import Runtime, cpu_runtime, tpu_runtime
from infinitensor_tpu.runtime.perf import PerfEngine
from infinitensor_tpu.runtime.workspace import Workspace

__all__ = ["GraphExecutor", "Runtime", "cpu_runtime", "tpu_runtime", "PerfEngine", "Workspace"]
