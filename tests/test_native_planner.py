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
