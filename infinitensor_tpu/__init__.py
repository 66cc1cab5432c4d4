"""InfiniTensor-TPU: a TPU-native graph compiler / inference engine.

A from-scratch re-design of the capabilities of InfiniTensor
(reference: /root/reference, an ONNX->graph->CUDA/BANG/... inference engine)
for TPU hardware: the graph IR lowers to JAX/XLA, hot kernels are Pallas,
parallelism is jax.sharding over a device Mesh, and the CUDA-Graph
capture/replay cache becomes a jitted-executable cache keyed by graph
topology + tensor metadata.

Layering (bottom to top):
  core/      graph IR: tensors, operators, graph, shape/dtype inference
  ops/       op semantics: shape rules + JAX lowerings + Pallas kernels
  runtime/   executors: jit compile cache, perf engine, profiling
  onnx/      standalone ONNX protobuf codec + importer/exporter
  parallel/  placements, TP/SP planner -> PartitionSpec, mesh utilities
  quant/     weight-only INT8/INT4 quantization
  models/    native model zoo (Llama, GPT-2, ResNet, BERT)
"""

__version__ = "0.1.0"

from infinitensor_tpu.core.dtype import DataType
from infinitensor_tpu.core.tensor import TensorObj, TensorRole
from infinitensor_tpu.core.graph import Graph
from infinitensor_tpu.core.handler import GraphHandler

__all__ = [
    "DataType",
    "TensorObj",
    "TensorRole",
    "Graph",
    "GraphHandler",
    "__version__",
]
