"""Utility tests: data generator, validation metrics, tensor dump/load
(reference test_tensor_save.cc / test_verify.cc analogs), operator timers."""

import numpy as np
import pytest

from infinitensor_tpu.utils.data import (
    DataGenerator, abs_error, rel_error, cosine_similarity,
    token_mismatch_rate,
)
from infinitensor_tpu.utils import dataio


def test_data_generator():
    g = DataGenerator(0)
    inc = g.incremental((2, 3))
    assert inc[1, 2] == 5
    r = g.random((4, 4), np.int8)
    assert r.dtype == np.int8
    oh = g.one_hot((2, 2), index=3)
    assert oh[1, 1] == 1 and oh.sum() == 1


def test_validation_metrics():
    a = np.array([1.0, 2.0, 3.0])
    b = np.array([1.0, 2.1, 3.0])
    assert abs(abs_error(a, b) - 0.1) < 1e-12
    assert rel_error(a, a) == 0.0
    assert cosine_similarity(a, a) == pytest.approx(1.0)
    assert token_mismatch_rate([1, 2, 3], [1, 0, 3]) == pytest.approx(1 / 3)


def test_tensor_save_load(tmp_path, rng):
    arr = rng.standard_normal((3, 4)).astype(np.float32)
    p = str(tmp_path / "t.itpu")
    dataio.save_tensor(arr, p, "x")
    np.testing.assert_array_equal(dataio.load_tensor(p), arr)


def test_multi_tensor_dump(tmp_path, rng):
    tensors = {
        "a": rng.standard_normal((2, 2)).astype(np.float32),
        "b": rng.integers(0, 10, (5,)).astype(np.int64),
    }
    p = str(tmp_path / "dump.itpu")
    dataio.save_tensors(tensors, p)
    loaded = dataio.load_tensors(p)
    assert set(loaded) == {"a", "b"}
    np.testing.assert_array_equal(loaded["a"], tensors["a"])
    np.testing.assert_array_equal(loaded["b"], tensors["b"])


def test_graph_weight_roundtrip(tmp_path, rng):
    from infinitensor_tpu.core.handler import GraphHandler
    h = GraphHandler()
    x = h.input((2, 4))
    w = h.weight(rng.standard_normal((4, 4)).astype(np.float32), name="w0")
    h.matmul(x, w)
    p = str(tmp_path / "weights.itpu")
    dataio.save_graph_weights(h.graph, p)
    w.data = np.zeros_like(w.data)
    assert dataio.load_graph_weights(h.graph, p) == 1
    assert np.abs(w.numpy()).max() > 0


def test_operator_timers_run():
    from infinitensor_tpu.runtime import operator_timer as ot
    assert ot.get_perf_matmul(1, 64, 64, 64) > 0
    assert ot.get_perf_conv(1, 3, 16, 16, 8, 3, 3, pad=1) > 0
    assert ot.get_perf_quant_matmul(8, 128, 128) > 0
    assert ot.get_perf_decode_attention(1, 4, 64, 32) > 0


def test_perf_engine_persistence(tmp_path):
    from infinitensor_tpu.runtime.perf import PerfEngine
    pe = PerfEngine()
    pe.set(("MatMul", ((2, 2),), ()), 1.25)
    p = str(tmp_path / "perf.json")
    pe.save(p)
    pe2 = PerfEngine()
    pe2.load(p)
    assert pe2.get(("MatMul", ((2, 2),), ())) == 1.25


# -- kernel autotuner (reference computeFuncTune analog) ----------------------

def test_tuner_picks_and_caches():
    import jax.numpy as jnp
    from infinitensor_tpu.runtime.perf import PerfEngine
    from infinitensor_tpu.runtime import tuner

    pe = PerfEngine()
    calls = []

    def make_fn(cfg):
        def fn(x):
            calls.append(cfg["k"])
            return x * cfg["k"]
        return fn

    x = jnp.ones((8, 8))
    cfg = tuner.tune("toy", make_fn, [{"k": 1}, {"k": 2}], (x,),
                     perf_engine=pe, warmup=0, iters=1)
    assert cfg["k"] in (1, 2)
    n = len(calls)
    # second call: cache hit, no timing
    cfg2 = tuner.tune("toy", make_fn, [{"k": 1}, {"k": 2}], (x,),
                      perf_engine=pe, warmup=0, iters=1)
    assert cfg2 == cfg and len(calls) == n


def test_tuner_skips_failing_config():
    import jax.numpy as jnp
    from infinitensor_tpu.runtime.perf import PerfEngine
    from infinitensor_tpu.runtime import tuner

    def make_fn(cfg):
        if cfg["bad"]:
            raise ValueError("invalid config")
        return lambda x: x + 1

    x = jnp.ones((4,))
    cfg = tuner.tune("partial", make_fn, [{"bad": True}, {"bad": False}],
                     (x,), perf_engine=PerfEngine(), warmup=0, iters=1)
    assert cfg == {"bad": False}


def test_tuner_persists_via_perf_engine(tmp_path):
    import jax.numpy as jnp
    from infinitensor_tpu.runtime.perf import PerfEngine
    from infinitensor_tpu.runtime import tuner

    pe = PerfEngine()
    x = jnp.ones((4,))
    tuner.tune("persisted", lambda c: (lambda v: v * c["k"]), [{"k": 3}],
               (x,), perf_engine=pe, warmup=0, iters=1)
    path = str(tmp_path / "perf.json")
    pe.save(path)
    pe2 = PerfEngine()
    pe2.load(path)
    cfg = tuner.tune("persisted", lambda c: 1 / 0, [{"k": 3}], (x,),
                     perf_engine=pe2)  # make_fn never called on cache hit
    assert cfg == {"k": 3}


def test_tuned_quant_matmul_matches_ref(rng):
    import jax.numpy as jnp
    from infinitensor_tpu.quant.weight_only import quantize_weight
    from infinitensor_tpu.kernels.quant_matmul import quant_matmul_ref
    from infinitensor_tpu.runtime.perf import PerfEngine
    from infinitensor_tpu.runtime.tuner import tuned_quant_matmul
    import numpy as np

    w = rng.standard_normal((64, 128)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    q = quantize_weight(jnp.asarray(w), bits=8, group_size=32)
    got = tuned_quant_matmul(x, q, perf_engine=PerfEngine())
    ref = quant_matmul_ref(x, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


# -- data_convert analog (reference src/utils/data_convert.cc) ---------------

def test_fp16_roundtrip():
    from infinitensor_tpu.utils import float_to_fp16, fp16_to_float
    x = np.array([0.0, 1.0, -2.5, 65504.0, 6.1e-5, 3.14159], np.float32)
    bits = float_to_fp16(x)
    assert bits.dtype == np.uint16
    back = fp16_to_float(bits)
    np.testing.assert_allclose(back, x.astype(np.float16).astype(np.float32))


def test_bf16_roundtrip_and_rne():
    from infinitensor_tpu.utils import float_to_bf16, bf16_to_float
    x = np.array([0.0, 1.0, -3.0, 1e30, 1.0 + 2 ** -9], np.float32)
    back = bf16_to_float(float_to_bf16(x))
    # bf16 keeps 8 mantissa bits -> relative error <= 2^-8 after RNE
    np.testing.assert_allclose(back, x, rtol=2 ** -8)
    # exact values representable in bf16 survive exactly
    exact = np.array([1.0, -0.5, 256.0, 0.0], np.float32)
    np.testing.assert_array_equal(bf16_to_float(float_to_bf16(exact)), exact)


# -- workspace (reference include/core/workspace.h) --------------------------

def test_workspace_bump_and_reset():
    from infinitensor_tpu.runtime import Workspace
    ws = Workspace(1024)
    a = ws.take(100)
    b = ws.take_as((4, 8), np.float32)
    assert a.nbytes == 100 and b.shape == (4, 8)
    assert ws.allocated == 100 + 128
    b[:] = 7.0  # writes land in the arena
    import pytest
    with pytest.raises(MemoryError):
        ws.take(1024)
    ws.reset()
    assert ws.allocated == 0
    assert ws.take(1024).nbytes == 1024
