"""Config registry, structured logging, allocator debug mode + memory-plan
validation (SURVEY aux items; reference analogs: CMake/ctor-kwarg config,
naive allocator graph.cc:371-380, validateMemory graph.cc:605-622)."""

import numpy as np
import pytest

from infinitensor_tpu.core.handler import GraphHandler
from infinitensor_tpu.native.planner import (
    plan_graph_memory, validate_memory_plan)
from infinitensor_tpu.utils.config import config
from infinitensor_tpu.utils.logging import get_logger


def _chain_graph(rng, n=4):
    h = GraphHandler()
    x = h.input((32, 32), name="x")
    for i in range(n):
        x = h.relu(h.matmul(
            x, h.weight(rng.standard_normal((32, 32), dtype=np.float32))))
    h.graph.infer_output_roles()
    return h.graph


def test_config_env_and_override(monkeypatch):
    assert config.executable_cache_capacity == 16
    monkeypatch.setenv("INFINITPU_EXEC_CACHE", "4")
    assert config.executable_cache_capacity == 4
    with config.override(executable_cache_capacity=2):
        assert config.executable_cache_capacity == 2
    assert config.executable_cache_capacity == 4
    with pytest.raises(KeyError):
        config.set(not_a_knob=1)
    snap = config.snapshot()
    assert snap["executable_cache_capacity"]["source"] == "env"
    assert snap["naive_allocator"]["source"] == "default"


def test_config_drives_executor_cache(monkeypatch):
    monkeypatch.setenv("INFINITPU_EXEC_CACHE", "3")
    h = GraphHandler()
    x = h.input((2, 4))
    h.relu(x)
    assert h.executor().cache_capacity == 3


def test_pallas_interpret_knob():
    from infinitensor_tpu.utils.platform import pallas_interpret
    assert not pallas_interpret()
    with config.override(pallas_interpret=True):
        assert pallas_interpret()


def test_naive_allocator_no_reuse(rng):
    g = _chain_graph(rng)
    fit = plan_graph_memory(g, naive=False)
    naive = plan_graph_memory(g, naive=True)
    # naive mode: disjoint regions, so no reuse -> peak >= best-fit peak
    assert naive["peak_bytes"] >= fit["peak_bytes"]
    offs = sorted((o, o + 32 * 32 * 4) for o in naive["offsets"].values())
    for (s1, e1), (s2, e2) in zip(offs, offs[1:]):
        assert e1 <= s2, "naive plan reused memory"
    assert validate_memory_plan(g, naive) == []


def test_validate_memory_plan_catches_overlap(rng):
    g = _chain_graph(rng)
    plan = plan_graph_memory(g, naive=False, validate=True)  # sound plan
    assert validate_memory_plan(g, plan) == []
    # corrupt: force two simultaneously-live activations onto one offset
    acts = [t.name for t in g.tensors if t.name in plan["offsets"]]
    bad = dict(plan)
    bad["offsets"] = dict(plan["offsets"])
    # matmul output and the relu output consuming it are live together
    mm_out = g.operators[0].outputs[0].name
    relu_out = g.operators[1].outputs[0].name
    if mm_out in bad["offsets"] and relu_out in bad["offsets"]:
        bad["offsets"][relu_out] = bad["offsets"][mm_out]
        assert validate_memory_plan(g, bad), "overlap not detected"


def test_structured_logging_emits():
    import logging
    log = get_logger("testmod")
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    lg = logging.getLogger("infinitensor_tpu.testmod")
    cap = Capture()
    lg.addHandler(cap)
    old = lg.level
    lg.setLevel(logging.INFO)
    try:
        log.info("event_happened", a=1, b="x")
    finally:
        lg.removeHandler(cap)
        lg.setLevel(old)
    assert "event_happened a=1 b=x" in records
