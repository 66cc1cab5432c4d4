from infinitensor_tpu.core.dtype import DataType
from infinitensor_tpu.core.tensor import TensorObj, TensorRole
from infinitensor_tpu.core.operator import Operator
from infinitensor_tpu.core.graph import Graph
from infinitensor_tpu.core.handler import GraphHandler

__all__ = ["DataType", "TensorObj", "TensorRole", "Operator", "Graph", "GraphHandler"]
