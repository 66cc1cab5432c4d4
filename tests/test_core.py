"""Core IR tests (mirrors reference test/core/test_graph.cc,
test_graph_handler.cc intent)."""

import numpy as np
import pytest

from infinitensor_tpu.core import dtype as dt
from infinitensor_tpu.core.dtype import DataType
from infinitensor_tpu.core.graph import Graph
from infinitensor_tpu.core.handler import GraphHandler
from infinitensor_tpu.core.operator import Operator
from infinitensor_tpu.core.tensor import TensorObj, TensorRole


def test_dtype_tables():
    assert dt.FLOAT32.onnx_id == 1
    assert dt.BFLOAT16.onnx_id == 16
    assert DataType.from_onnx(7) is dt.INT64
    assert dt.INT4.size_bits == 4
    assert dt.FLOAT32.np() == np.float32
    assert DataType.from_numpy(np.int8) is dt.INT8


def test_tensor_basics():
    t = TensorObj((2, 3), dt.FLOAT32, role=TensorRole.WEIGHT)
    assert t.size() == 6 and t.bytes() == 24
    t.set_data(np.arange(6, dtype=np.float32))
    assert t.numpy().shape == (2, 3)


def test_handler_builds_and_sorts():
    h = GraphHandler()
    x = h.input((2, 4))
    w = h.weight(np.ones((4, 8), np.float32))
    y = h.matmul(x, w)
    z = h.relu(y)
    assert z.shape == (2, 8)
    assert h.topo_sort()
    assert len(h.graph.operators) == 2


def test_topo_sort_orders_dependencies():
    # Build out of order by hand.
    g = Graph()
    a = g.add_tensor(TensorObj((2,), dt.FLOAT32, role=TensorRole.INPUT))
    b = g.add_tensor(TensorObj((2,), dt.FLOAT32))
    c = g.add_tensor(TensorObj((2,), dt.FLOAT32))
    op2 = Operator("Relu", [b], [c])
    op1 = Operator("Abs", [a], [b])
    # add consumer first
    for t in op2.inputs:
        t.add_target(op2)
    c.source = op2
    g.operators.append(op2)
    for t in op1.inputs:
        t.add_target(op1)
    b.source = op1
    g.operators.append(op1)
    assert g.topo_sort()
    assert g.operators[0] is op1


def test_cycle_detected():
    g = Graph()
    a = g.add_tensor(TensorObj((2,), dt.FLOAT32))
    b = g.add_tensor(TensorObj((2,), dt.FLOAT32))
    op1 = Operator("Relu", [a], [b])
    op2 = Operator("Relu", [b], [a])
    for op in (op1, op2):
        for t in op.inputs:
            t.add_target(op)
        op.outputs[0].source = op
        g.operators.append(op)
    assert not g.topo_sort()


def test_graph_clone_preserves_fuid():
    h = GraphHandler()
    x = h.input((2, 4))
    y = h.relu(x)
    g2 = h.graph.clone()
    assert len(g2.operators) == 1
    orig = {t.fuid for t in h.graph.tensors}
    cloned = {t.fuid for t in g2.tensors}
    assert orig == cloned


def test_change_shape_and_reinfer():
    h = GraphHandler()
    x = h.input((2, 4))
    w = h.weight(np.ones((4, 8), np.float32))
    y = h.matmul(x, w)
    h.change_shape(x, (16, 4))
    h.shape_infer()
    assert y.shape == (16, 8)


def test_workload_key_stable():
    h = GraphHandler()
    x = h.input((2, 4))
    y = h.relu(x)
    k1 = y.source.workload_key()
    h2 = GraphHandler()
    x2 = h2.input((2, 4))
    y2 = h2.relu(x2)
    assert k1 == y2.source.workload_key()
