"""Native allocator tests (the analog of reference test_lazy_allocator.cc:
best-fit reuse, free-block coalescing, graph-level planning)."""

import numpy as np
import pytest

from infinitensor_tpu.native import (
    MemoryPlanner, plan_graph_memory, native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++/native build unavailable")

KB = 1024


def test_alloc_free_reuse():
    p = MemoryPlanner()
    a = p.alloc(4 * KB)
    b = p.alloc(8 * KB)
    assert a != b
    p.free(a)
    c = p.alloc(2 * KB)      # best-fit: reuses a's hole
    assert c == a
    assert p.used == 10 * KB


def test_coalescing():
    p = MemoryPlanner()
    blocks = [p.alloc(4 * KB) for _ in range(4)]
    # free middle two -> adjacent blocks must coalesce into one
    p.free(blocks[1])
    p.free(blocks[2])
    assert p.free_block_count == 1
    big = p.alloc(8 * KB)    # fits in the coalesced hole
    assert big == blocks[1]


def test_peak_tracking():
    p = MemoryPlanner()
    a = p.alloc(10 * KB)
    p.free(a)
    b = p.alloc(2 * KB)
    assert p.peak == 10 * KB
    assert p.used == 2 * KB


def test_weight_region_separate():
    p = MemoryPlanner()
    w0 = p.alloc_weight(100)
    w1 = p.alloc_weight(100)
    assert w0 == 0 and w1 == 512  # aligned
    assert p.peak == 0            # weights don't count toward activations


def test_graph_plan_reuses_memory(rng):
    """Sequential chain: activations must be reused, peak << sum."""
    from infinitensor_tpu.core.handler import GraphHandler
    h = GraphHandler()
    x = h.input((256, 256), name="x")
    t = x
    for i in range(10):
        t = h.relu(t)
    h.graph.infer_output_roles()
    plan = plan_graph_memory(h.graph)
    one = 256 * 256 * 4
    total = 10 * one
    assert plan["peak_bytes"] <= 2 * one + 1024  # at most 2 live at a time
    assert plan["arena_bytes"] < total
    assert len(plan["offsets"]) == 10


def test_graph_plan_branches(rng):
    """Fan-out keeps both branches live until joined."""
    from infinitensor_tpu.core.handler import GraphHandler
    h = GraphHandler()
    x = h.input((128, 128), name="x")
    a = h.relu(x)
    b = h.neg(x)
    c = h.add(a, b)
    h.graph.infer_output_roles()
    plan = plan_graph_memory(h.graph)
    one = 128 * 128 * 4
    assert plan["peak_bytes"] >= 3 * one  # a, b, c live simultaneously
    assert plan["weight_bytes"] == 0


# -- native graph core (topo sort / liveness / hash) --------------------------

def _random_dag_graph(rng, n_chains=8, depth=12):
    """Layered random DAG built through the handler: chains of matmuls with
    random cross-links via Add."""
    from infinitensor_tpu.core.handler import GraphHandler
    import numpy as np
    h = GraphHandler()
    x = h.input((4, 4), name="x")
    frontier = [x]
    for _ in range(depth):
        nxt = []
        for _ in range(n_chains // 2):
            a = frontier[rng.integers(len(frontier))]
            b = frontier[rng.integers(len(frontier))]
            nxt.append(h.add(a, b))
        frontier = nxt + [frontier[0]]
    h.graph.infer_output_roles()
    return h.graph


def test_native_topo_sort_matches_python(rng):
    from infinitensor_tpu.native import graph_core
    if not graph_core.native_available():
        import pytest
        pytest.skip("no g++")
    g = _random_dag_graph(rng)
    order = graph_core.topo_sort(g)
    assert order is not None and len(order) == len(g.operators)
    # validity: every op's producing predecessors appear earlier
    pos = {op.guid: i for i, op in enumerate(order)}
    for op in order:
        for p in op.predecessors():
            assert pos[p.guid] < pos[op.guid]


def test_native_topo_sort_detects_cycle():
    from infinitensor_tpu.native import graph_core
    if not graph_core.native_available():
        import pytest
        pytest.skip("no g++")
    from infinitensor_tpu.core.graph import Graph
    from infinitensor_tpu.core.operator import Operator
    from infinitensor_tpu.core.tensor import TensorObj
    from infinitensor_tpu.core import dtype as dt
    g = Graph()
    a = g.add_tensor(TensorObj((2, 2), dt.FLOAT32))
    b = g.add_tensor(TensorObj((2, 2), dt.FLOAT32))
    g.add_op(Operator("Relu", [a], [b]))
    g.add_op(Operator("Relu", [b], [a]))  # cycle
    assert graph_core.topo_sort(g) is None


def test_native_liveness(rng):
    from infinitensor_tpu.native import graph_core
    if not graph_core.native_available():
        import pytest
        pytest.skip("no g++")
    g = _random_dag_graph(rng, depth=4)
    lv = graph_core.liveness(g)
    for op_pos, op in enumerate(g.operators):
        for t in op.outputs:
            first, _ = lv[t.name]
            assert first <= op_pos
        for t in op.inputs:
            if t is not None and t.name in lv:
                _, last = lv[t.name]
                assert last >= op_pos or last == -1


def test_native_workload_hash_stable():
    from infinitensor_tpu.native import graph_core
    if not graph_core.native_available():
        import pytest
        pytest.skip("no g++")
    h1 = graph_core.workload_hash([1, 2, 3])
    h2 = graph_core.workload_hash([1, 2, 3])
    h3 = graph_core.workload_hash([1, 2, 4])
    assert h1 == h2 != h3


def test_graph_topo_sort_uses_native_on_large_graph(rng):
    """A >=64-op graph sorts through the native path and stays valid."""
    from infinitensor_tpu.native import graph_core
    if not graph_core.native_available():
        import pytest
        pytest.skip("no g++")
    g = _random_dag_graph(rng, n_chains=8, depth=20)
    assert len(g.operators) >= 64
    assert g.topo_sort()
    pos = {op.guid: i for i, op in enumerate(g.operators)}
    for op in g.operators:
        for p in op.predecessors():
            assert pos[p.guid] < pos[op.guid]
