"""Oracle tests for the widened ONNX op set (coverage beyond the
reference importer's 68 ops; reference include/core/op_type.h enumerates
them without kernels). Pattern follows test_executor.py: build graph via
GraphHandler._add -> run -> compare vs numpy/torch oracle."""

import numpy as np
import pytest

from infinitensor_tpu.core.handler import GraphHandler


def run_op(op_type, arrays, attrs=None, weights=(), n_out=1):
    h = GraphHandler()
    tensors = []
    feeds = {}
    for i, a in enumerate(arrays):
        if i in weights:
            tensors.append(h.weight(a))
        else:
            t = h.input(a.shape, dtype=_dt(a))
            feeds[t.name] = a
            tensors.append(t)
    h._add(op_type, tensors, dict(attrs or {}))
    outs = h.run(feeds, return_numpy=True)
    vals = list(outs.values())
    return vals[0] if n_out == 1 else vals


def _dt(a):
    from infinitensor_tpu.core import dtype as dt
    return {np.dtype(np.float32): dt.FLOAT32, np.dtype(np.int64): dt.INT64,
            np.dtype(np.int32): dt.INT32,
            np.dtype(np.bool_): dt.BOOL}[a.dtype]


def test_new_unaries(rng):
    x = rng.uniform(0.1, 0.9, (3, 5)).astype(np.float32)
    np.testing.assert_allclose(run_op("Asinh", [x]), np.arcsinh(x), rtol=1e-5)
    np.testing.assert_allclose(run_op("Atanh", [x]), np.arctanh(x), rtol=1e-5)
    np.testing.assert_allclose(run_op("Acosh", [1 + x]), np.arccosh(1 + x),
                               rtol=1e-5)
    np.testing.assert_allclose(run_op("Rsqrt", [x]), 1 / np.sqrt(x),
                               rtol=1e-5)
    np.testing.assert_allclose(run_op("Square", [x]), x * x, rtol=1e-6)
    np.testing.assert_allclose(
        run_op("Mish", [x]),
        x * np.tanh(np.log1p(np.exp(x))), rtol=1e-5)


def test_is_nan_inf():
    x = np.array([1.0, np.nan, np.inf, -np.inf], np.float32)
    np.testing.assert_array_equal(run_op("IsNaN", [x]),
                                  [False, True, False, False])
    np.testing.assert_array_equal(run_op("IsInf", [x]),
                                  [False, False, True, True])
    np.testing.assert_array_equal(
        run_op("IsInf", [x], {"detect_negative": 0}),
        [False, False, True, False])


def test_attr_activations(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((4, 6)).astype(np.float32)
    tx = torch.from_numpy(x)
    np.testing.assert_allclose(run_op("Selu", [x]),
                               torch.nn.functional.selu(tx).numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(run_op("Celu", [x], {"alpha": 0.7}),
                               torch.nn.functional.celu(tx, 0.7).numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        run_op("ThresholdedRelu", [x], {"alpha": 0.3}),
        np.where(x > 0.3, x, 0), rtol=1e-6)
    shrink_ref = np.where(x < -0.4, x + 0.1, np.where(x > 0.4, x - 0.1, 0))
    np.testing.assert_allclose(
        run_op("Shrink", [x], {"lambd": 0.4, "bias": 0.1}), shrink_ref,
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(run_op("Hardtanh", [x]),
                               np.clip(x, -1, 1), rtol=1e-6)


def test_hardmax(rng):
    x = rng.standard_normal((3, 7)).astype(np.float32)
    out = run_op("Hardmax", [x], {"axis": -1})
    exp = np.zeros_like(x)
    exp[np.arange(3), x.argmax(-1)] = 1
    np.testing.assert_array_equal(out, exp)


def test_variadic_sum_mean(rng):
    xs = [rng.standard_normal((2, 3)).astype(np.float32) for _ in range(3)]
    np.testing.assert_allclose(run_op("Sum", xs), sum(xs), rtol=1e-6)
    np.testing.assert_allclose(run_op("MeanN", xs), sum(xs) / 3, rtol=1e-6)


def test_reduce_extras(rng):
    x = rng.uniform(0.5, 2.0, (2, 4, 3)).astype(np.float32)
    np.testing.assert_allclose(
        run_op("ReduceLogSum", [x], {"axes": [1], "keepdims": 0}),
        np.log(x.sum(1)), rtol=1e-5)
    np.testing.assert_allclose(
        run_op("ReduceLogSumExp", [x], {"axes": [2], "keepdims": 1}),
        np.log(np.exp(x).sum(2, keepdims=True)), rtol=1e-5)
    np.testing.assert_allclose(
        run_op("ReduceSumSquare", [x], {"axes": [0], "keepdims": 0}),
        (x * x).sum(0), rtol=1e-5)


def test_einsum(rng):
    a = rng.standard_normal((3, 4, 5)).astype(np.float32)
    b = rng.standard_normal((5, 6)).astype(np.float32)
    out = run_op("Einsum", [a, b], {"equation": "bij,jk->bik"})
    np.testing.assert_allclose(out, np.einsum("bij,jk->bik", a, b),
                               rtol=1e-4, atol=1e-5)
    # ellipsis + explicit output
    d = rng.standard_normal((2, 5, 7)).astype(np.float32)
    out = run_op("Einsum", [d], {"equation": "...ij->...ji"})
    np.testing.assert_allclose(out, np.transpose(d, (0, 2, 1)), rtol=1e-6)


def test_einsum_shape_rule_matches_numpy():
    from infinitensor_tpu.ops.shape_rules import _parse_einsum
    cases = [
        ("ij,jk->ik", [(3, 4), (4, 5)]),
        ("bij,jk", [(2, 3, 4), (4, 5)]),
        ("...ij,jk->...ik", [(7, 3, 4), (4, 5)]),
        ("ii->i", [(5, 5)]),
        ("ij->", [(3, 4)]),
    ]
    for eq, shapes in cases:
        got = _parse_einsum(eq, [list(s) for s in shapes])
        exp = np.einsum(eq, *[np.zeros(s, np.float32) for s in shapes]).shape
        assert got == tuple(exp), (eq, got, exp)


def test_gather_scatter_nd(rng):
    data = rng.standard_normal((4, 5, 6)).astype(np.float32)
    idx = np.array([[0, 1], [2, 3], [3, 4]], np.int64)
    out = run_op("GatherND", [data, idx])
    np.testing.assert_allclose(out, data[idx[:, 0], idx[:, 1]], rtol=1e-6)

    upd = rng.standard_normal((3, 6)).astype(np.float32)
    out = run_op("ScatterND", [data, idx, upd])
    exp = data.copy()
    exp[idx[:, 0], idx[:, 1]] = upd
    np.testing.assert_allclose(out, exp, rtol=1e-6)


def test_group_norm(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 8, 5, 5)).astype(np.float32)
    g = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    out = run_op("GroupNormalization", [x, g, b],
                 {"num_groups": 4, "epsilon": 1e-5}, weights=(1, 2))
    ref = torch.nn.functional.group_norm(
        torch.from_numpy(x), 4, torch.from_numpy(g), torch.from_numpy(b),
        1e-5).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_mvn_lpnorm(rng):
    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    out = run_op("MeanVarianceNormalization", [x], {"axes": [0, 2, 3]})
    mean = x.mean((0, 2, 3), keepdims=True)
    std = x.std((0, 2, 3), keepdims=True)
    np.testing.assert_allclose(out, (x - mean) / (std + 1e-9),
                               rtol=1e-4, atol=1e-5)

    y = rng.standard_normal((3, 5)).astype(np.float32)
    out = run_op("LpNormalization", [y], {"axis": 1, "p": 2})
    np.testing.assert_allclose(
        out, y / np.linalg.norm(y, axis=1, keepdims=True),
        rtol=1e-5, atol=1e-6)


def test_lp_pool(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    out = run_op("LpPool", [x], {"p": 2, "kernel_shape": [2, 2],
                                 "strides": [2, 2]})
    ref = torch.nn.functional.lp_pool2d(torch.from_numpy(x), 2, 2,
                                        stride=2).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    out = run_op("GlobalLpPool", [x], {"p": 2})
    ref = np.sqrt((x ** 2).sum((2, 3), keepdims=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_eye_like_and_random(rng):
    x = np.zeros((4, 6), np.float32)
    out = run_op("EyeLike", [x], {"k": 1})
    np.testing.assert_array_equal(out, np.eye(4, 6, k=1, dtype=np.float32))

    out = run_op("RandomNormal", [], {"shape": [64, 64], "dtype": 1,
                                      "seed": 3.0})
    assert out.shape == (64, 64)
    assert abs(float(out.mean())) < 0.1 and 0.8 < float(out.std()) < 1.2

    out = run_op("RandomUniform", [], {"shape": [32, 32], "dtype": 1,
                                       "low": 2.0, "high": 3.0, "seed": 5.0})
    assert float(out.min()) >= 2.0 and float(out.max()) <= 3.0

    p = np.full((1000,), 0.25, np.float32)
    out = run_op("Bernoulli", [p], {"seed": 7.0})
    assert 0.15 < float(out.mean()) < 0.35


def test_new_binaries(rng):
    a = rng.standard_normal((3, 4)).astype(np.float32) * 5
    b = rng.uniform(0.5, 2.0, (3, 4)).astype(np.float32)
    np.testing.assert_allclose(run_op("FloorDiv", [a, b]),
                               np.floor_divide(a, b), rtol=1e-5)
    np.testing.assert_allclose(run_op("FloorMod", [a, b]),
                               a - np.floor_divide(a, b) * b,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(run_op("SquaredDifference", [a, b]),
                               (a - b) ** 2, rtol=1e-5)


def test_onnx_roundtrip_wide_ops(rng):
    """Export -> parse -> re-import -> run a graph using widened ops,
    through this repo's own protobuf codec (no onnx pip dependency)."""
    from infinitensor_tpu.onnx.exporter import export_onnx
    from infinitensor_tpu.onnx.importer import OnnxStub

    h = GraphHandler()
    x = h.input((2, 6, 4, 4), name="x")
    g = h.weight(np.ones(6, np.float32))
    b = h.weight(np.zeros(6, np.float32))
    m = h._add("Mish", [x], {})
    n = h._add("GroupNormalization", [m, g, b],
               {"num_groups": 3, "epsilon": 1e-5})
    s = h._add("Selu", [n], {})
    e = h._add("Einsum", [s], {"equation": "bcij->bc"})
    h.graph.infer_output_roles()

    xv = rng.standard_normal((2, 6, 4, 4)).astype(np.float32)
    ref = h.run({"x": xv}, return_numpy=True)
    stub = OnnxStub(export_onnx(h.graph, "wide").serialize())
    got = stub.run({"x": xv}, return_numpy=True)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-5)
