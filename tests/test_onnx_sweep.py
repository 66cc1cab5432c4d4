"""Exhaustive ONNX round-trip sweep: every registered op type is built as a
one-node graph, executed, exported, re-imported, and re-executed (VERDICT
item 7; reference analog: pyinfinitensor/tests/test_onnx.py's per-op
one-node models, 616 LoC). Ops that cannot run single-device (collectives)
round-trip structurally; the explicit EXCLUDED list documents the rest."""

import numpy as np
import pytest

from infinitensor_tpu.core import dtype as dt
from infinitensor_tpu.core.handler import GraphHandler
from infinitensor_tpu.core.operator import BINARY_OPS, COMM_OPS, UNARY_OPS
from infinitensor_tpu.onnx.exporter import export_onnx
from infinitensor_tpu.onnx.importer import OnnxStub
from infinitensor_tpu.ops.lowering import LOWERINGS

#: ops with no meaningful single-node ONNX round-trip, and why
EXCLUDED = {
    "MemBound": "kernel body is an expression object, not serializable",
    "Send": "pure side-effect op: no output tensor to compare",
    "Recv": "source rank input does not exist single-device",
}

#: collectives: build + export + re-import structurally, but skip execution
#: (lowering requires a shard_map mesh; covered by distributed tests)
STRUCTURAL_ONLY = COMM_OPS - {"Send", "Recv"}

#: nondeterministic ops: compare output shape/dtype, not values
RANDOM_OPS = {"RandomNormal", "RandomUniform", "RandomNormalLike",
              "RandomUniformLike", "Bernoulli"}

F = np.float32


def _f(rng, *shape):
    return rng.standard_normal(shape).astype(F)


def _build(op_type, h, rng):
    """Build a one-node graph; returns feed dict."""
    a = {}
    if op_type == "PRelu":
        h._add("PRelu",
               [h.input((4, 8), name="x"),
                h.weight(rng.uniform(0.1, 0.3, (8,)).astype(F))], {})
        return {"x": _f(rng, 4, 8)}
    if op_type in UNARY_OPS or op_type in {"IsNaN", "Det", "Dropout",
                                           "Identity", "IsInf"}:
        if op_type in ("Not",):
            x = h.weight((rng.standard_normal((2, 8)) > 0), dtype=dt.BOOL)
            h._add(op_type, [x], {})
            return {}
        if op_type == "BitwiseNot":
            x = h.weight(rng.integers(0, 100, (2, 8)).astype(np.int32))
            h._add(op_type, [x], {})
            return {}
        if op_type == "Det":
            x = h.input((3, 3), name="x")
            h._add("Det", [x], {})
            return {"x": _f(rng, 3, 3)}
        x = h.input((2, 8), name="x")
        attrs = {"alpha": 0.1} if op_type in ("LeakyRelu", "Elu", "Celu",
                                              "ThresholdedRelu") else {}
        h._add(op_type, [x], attrs)
        feed = rng.uniform(0.1, 2.0, (2, 8)).astype(F) \
            if op_type in ("Log", "Sqrt", "Acosh", "Rsqrt", "Reciprocal") \
            else (rng.uniform(-0.9, 0.9, (2, 8)).astype(F)
                  if op_type in ("Asin", "Acos", "Atanh", "Asinh") else
                  _f(rng, 2, 8))
        if op_type == "Acosh":
            feed = rng.uniform(1.1, 3.0, (2, 8)).astype(F)
        return {"x": feed}
    if op_type in BINARY_OPS:
        int_ops = {"Mod", "FloorDiv", "FloorMod", "BitwiseAnd", "BitwiseOr",
                   "BitwiseXor"}
        bool_ops = {"And", "Or", "Xor"}
        if op_type in int_ops:
            x = h.input((2, 8), dtype=dt.INT32, name="x")
            y = h.weight(rng.integers(1, 9, (2, 8)).astype(np.int32))
            feed = rng.integers(1, 50, (2, 8)).astype(np.int32)
        elif op_type in bool_ops:
            x = h.input((2, 8), dtype=dt.BOOL, name="x")
            y = h.weight(rng.standard_normal((2, 8)) > 0, dtype=dt.BOOL)
            feed = rng.standard_normal((2, 8)) > 0
        else:
            x = h.input((2, 8), name="x")
            y = h.weight(rng.uniform(0.2, 2.0, (2, 8)).astype(F))
            feed = _f(rng, 2, 8)
        h._add(op_type, [x, y], {})
        return {"x": feed}

    x48 = lambda name="x": h.input((4, 8), name=name)  # noqa: E731
    img = lambda: h.input((1, 4, 8, 8), name="x")      # noqa: E731

    builders = {
        "ArgMax": lambda: h._add("ArgMax", [x48()], {"axis": 1,
                                                     "keepdims": 0}),
        "ArgMin": lambda: h._add("ArgMin", [x48()], {"axis": 1,
                                                     "keepdims": 0}),
        "AveragePool": lambda: h._add("AveragePool", [img()],
                                      {"kernel_shape": [2, 2],
                                       "strides": [2, 2],
                                       "pads": [0, 0, 0, 0]}),
        "MaxPool": lambda: h._add("MaxPool", [img()],
                                  {"kernel_shape": [2, 2], "strides": [2, 2],
                                   "pads": [0, 0, 0, 0]}),
        "LpPool": lambda: h._add("LpPool", [img()],
                                 {"kernel_shape": [2, 2], "strides": [2, 2],
                                  "pads": [0, 0, 0, 0], "p": 2}),
        "GlobalAveragePool": lambda: h._add("GlobalAveragePool", [img()], {}),
        "GlobalMaxPool": lambda: h._add("GlobalMaxPool", [img()], {}),
        "GlobalLpPool": lambda: h._add("GlobalLpPool", [img()], {"p": 2}),
        "BatchNormalization": lambda: h._add(
            "BatchNormalization",
            [img(), h.weight(_f(rng, 4)), h.weight(_f(rng, 4)),
             h.weight(_f(rng, 4)),
             h.weight(rng.uniform(0.5, 2, 4).astype(F))],
            {"epsilon": 1e-5}),
        "InstanceNormalization": lambda: h._add(
            "InstanceNormalization",
            [img(), h.weight(_f(rng, 4)), h.weight(_f(rng, 4))],
            {"epsilon": 1e-5}),
        "GroupNormalization": lambda: h._add(
            "GroupNormalization",
            [img(), h.weight(_f(rng, 4)), h.weight(_f(rng, 4))],
            {"num_groups": 2, "epsilon": 1e-5}),
        "LayerNormalization": lambda: h._add(
            "LayerNormalization", [x48(), h.weight(_f(rng, 8)),
                                   h.weight(_f(rng, 8))],
            {"axis": -1, "epsilon": 1e-5}),
        "RMSNorm": lambda: h._add("RMSNorm", [x48(), h.weight(_f(rng, 8))],
                                  {"epsilon": 1e-6}),
        "SkipRMSNorm": lambda: h._add(
            "SkipRMSNorm", [x48(), h.weight(_f(rng, 4, 8)),
                            h.weight(_f(rng, 8))], {"epsilon": 1e-6}),
        "MeanVarianceNormalization": lambda: h._add(
            "MeanVarianceNormalization", [img()], {"axes": [0, 2, 3]}),
        "LpNormalization": lambda: h._add("LpNormalization", [x48()],
                                          {"axis": -1, "p": 2}),
        "LRN": lambda: h._add("LRN", [img()],
                              {"alpha": 1e-4, "beta": 0.75, "bias": 1.0,
                               "size": 3}),
        "Softmax": lambda: h._add("Softmax", [x48()], {"axis": -1}),
        "LogSoftmax": lambda: h._add("LogSoftmax", [x48()], {"axis": -1}),
        "Cast": lambda: h._add("Cast", [x48()],
                               {"to": dt.INT32.onnx_id}),
        "CastLike": lambda: h._add(
            "CastLike", [x48(), h.weight(np.ones((1,), np.int32))], {}),
        "Clip": lambda: h._add("Clip", [x48()], {"min": -0.5, "max": 0.5}),
        "Concat": lambda: h._add(
            "Concat", [x48(), h.weight(_f(rng, 4, 8))], {"axis": 1}),
        "ConstantOfShape": lambda: h._add(
            "ConstantOfShape", [], {"shape": [2, 3], "value": 1.5}),
        "Conv": lambda: h._add(
            "Conv", [img(), h.weight(_f(rng, 6, 4, 3, 3))],
            {"pads": [1, 1, 1, 1], "strides": [1, 1], "dilations": [1, 1]}),
        "Im2colMatmulConv": lambda: h._add(
            "Im2colMatmulConv", [img(), h.weight(_f(rng, 6, 4, 3, 3))],
            {"pads": [1, 1, 1, 1], "strides": [1, 1], "dilations": [1, 1]}),
        "ConvTranspose": lambda: h._add(
            "ConvTranspose", [img(), h.weight(_f(rng, 4, 6, 3, 3))],
            {"pads": [1, 1, 1, 1], "strides": [2, 2], "dilations": [1, 1]}),
        "CumSum": lambda: h._add("CumSum", [x48()], {"axis": 1}),
        "DepthToSpace": lambda: h._add("DepthToSpace", [img()],
                                       {"blocksize": 2, "mode": "DCR"}),
        "SpaceToDepth": lambda: h._add("SpaceToDepth", [img()],
                                       {"blocksize": 2}),
        "DequantizeLinear": lambda: h._add(
            "DequantizeLinear",
            [h.weight(rng.integers(-127, 127, (4, 8)).astype(np.int8)),
             h.weight(rng.uniform(0.01, 0.1, (8,)).astype(F))],
            {"axis": 1}),
        "QuantizeLinear": lambda: h._add(
            "QuantizeLinear",
            [x48(), h.weight(rng.uniform(0.01, 0.1, (8,)).astype(F))],
            {"axis": 1}),
        "DynamicQuantizeLinear": lambda: h._add(
            "DynamicQuantizeLinear", [x48()], {}),
        "MatMulInteger": lambda: h._add(
            "MatMulInteger",
            [h.weight(rng.integers(-100, 100, (4, 8)).astype(np.int8)),
             h.weight(rng.integers(-100, 100, (8, 5)).astype(np.int8))],
            {}),
        "Dropout": lambda: h._add("Dropout", [x48()], {}),
        "Einsum": lambda: h._add(
            "Einsum", [x48(), h.weight(_f(rng, 8, 5))],
            {"equation": "ij,jk->ik"}),
        "Expand": lambda: h._add("Expand", [h.input((4, 1), name="x")],
                                 {"shape": [4, 6]}),
        "Extend": lambda: h._add("Extend", [x48()], {"dim": 1, "num": 1}),
        "EyeLike": lambda: h._add("EyeLike", [x48()], {"k": 0}),
        "Flatten": lambda: h._add("Flatten", [img()], {"axis": 1}),
        "G2BMM": lambda: h._add(
            "G2BMM", [h.input((2, 16, 8), name="x"),
                      h.weight(_f(rng, 2, 16, 8))],
            {"width": 2, "dilation": 1}),
        "GBMM": lambda: h._add(
            "GBMM", [h.input((2, 16, 5), name="x"),
                     h.weight(_f(rng, 2, 16, 8))],
            {"dilation": 1}),
        "Gather": lambda: h._add(
            "Gather", [x48(), h.weight(np.array([0, 2], np.int32))],
            {"axis": 1}),
        "GatherElements": lambda: h._add(
            "GatherElements",
            [x48(), h.weight(rng.integers(0, 4, (2, 8)).astype(np.int32))],
            {"axis": 0}),
        "GatherND": lambda: h._add(
            "GatherND", [x48(), h.weight(np.array([[0], [2]], np.int64))],
            {"batch_dims": 0}),
        "Gemm": lambda: h._add(
            "Gemm", [x48(), h.weight(_f(rng, 8, 5)), h.weight(_f(rng, 5))],
            {"alpha": 1.0, "beta": 1.0, "transA": 0, "transB": 0}),
        "MatMul": lambda: h._add("MatMul", [x48(), h.weight(_f(rng, 8, 5))],
                                 {}),
        "MeanN": lambda: h._add("MeanN", [x48(), h.weight(_f(rng, 4, 8))],
                                {}),
        "Sum": lambda: h._add("Sum", [x48(), h.weight(_f(rng, 4, 8))], {}),
        "OneHot": lambda: h._add(
            "OneHot", [h.weight(np.array([0, 2, 1], np.int32))],
            {"depth": 4, "axis": -1, "off_value": 0.0, "on_value": 1.0}),
        "Pad": lambda: h._add("Pad", [x48()],
                              {"pads": [0, 1, 0, 1], "mode": "constant"}),
        "Range": lambda: h._add(
            "Range", [], {"start": 0, "limit": 10, "delta": 2, "length": 5,
                          "dtype": dt.INT64.onnx_id}),
        "Reshape": lambda: h._add("Reshape", [x48()], {"shape": [2, 16]}),
        "Resize": lambda: h._add(
            "Resize", [img()], {"out_shape": [1, 4, 16, 16],
                                "mode": "nearest"}),
        "Upsample": lambda: h._add(
            "Upsample", [img()], {"out_shape": [1, 4, 16, 16],
                                  "mode": "nearest"}),
        "RoPE": lambda: h._add(
            "RoPE", [h.weight(np.arange(4, dtype=np.int32).reshape(1, 4)),
                     h.input((1, 4, 64), name="x")], {"dim_head": 64}),
        "AttentionKVCache": lambda: h.attention_kvcache(
            h.input((1, 2, 16, 8), name="kc"),
            h.input((1, 2, 16, 8), name="vc"),
            h.input((1, 2, 1, 8), name="q"),
            h.input((1, 2, 1, 8), name="k"),
            h.input((1, 2, 1, 8), name="v"),
            h.weight(np.array([3], np.int32))),
        "AttentionKVCacheQ8": lambda: h.attention_kvcache_q8(
            h.input((1, 2, 16, 8), dtype=dt.INT8, name="kc"),
            h.input((1, 2, 16, 8), dtype=dt.INT8, name="vc"),
            h.input((1, 2, 16), name="ks"),
            h.input((1, 2, 16), name="vs"),
            h.input((1, 4, 1, 8), name="q"),        # GQA: H=4, Hkv=2
            h.input((1, 2, 1, 8), name="k"),
            h.input((1, 2, 1, 8), name="v"),
            h.weight(np.array([3], np.int32))),
        "MatMulWOQ": lambda: h.matmul_woq(
            h.input((2, 256), name="x"),
            h.weight(rng.integers(-127, 127, (256, 8)).astype(np.int8)),
            h.weight(rng.uniform(0.01, 0.1, (2, 8)).astype(F)),
            bits=8, group_size=128,
            norm_weight=h.weight(rng.uniform(0.5, 1.5, (256,)).astype(F))),
        "ScatterElements": lambda: h._add(
            "ScatterElements",
            [x48(), h.weight(np.array([[0, 1]], np.int32)),
             h.weight(_f(rng, 1, 2))], {"axis": 0}),
        "ScatterND": lambda: h._add(
            "ScatterND",
            [x48(), h.weight(np.array([[0], [2]], np.int64)),
             h.weight(_f(rng, 2, 8))], {}),
        "Shape": lambda: h._add("Shape", [x48()], {}),
        "Slice": lambda: h._add("Slice", [x48()],
                                {"starts": [1], "ends": [3], "axes": [0],
                                 "steps": [1]}),
        "Split": lambda: h._add("Split", [x48()],
                                {"axis": 1, "split": [3, 5]}),
        "Squeeze": lambda: h._add(
            "Squeeze", [h.input((4, 1, 8), name="x")], {"axes": [1]}),
        "Unsqueeze": lambda: h._add("Unsqueeze", [x48()], {"axes": [0]}),
        "Tile": lambda: h._add("Tile", [x48()], {"repeats": [2, 1]}),
        "TopK": lambda: h._add("TopK", [x48()],
                               {"k": 3, "axis": -1, "largest": 1}),
        "Transpose": lambda: h._add("Transpose", [x48()], {"perm": [1, 0]}),
        "Trilu": lambda: h._add("Trilu", [x48()], {"upper": 1, "k": 0}),
        "Where": lambda: h._add(
            "Where",
            [h.weight(rng.standard_normal((4, 8)) > 0, dtype=dt.BOOL),
             x48(), h.weight(_f(rng, 4, 8))], {}),
        "Identity": lambda: h._add("Identity", [x48()], {}),
        "IsInf": lambda: h._add("IsInf", [x48()], {"detect_negative": 1,
                                                   "detect_positive": 1}),
        "RandomNormal": lambda: h._add(
            "RandomNormal", [], {"shape": [2, 4], "dtype": 1, "seed": 1.0}),
        "RandomUniform": lambda: h._add(
            "RandomUniform", [], {"shape": [2, 4], "dtype": 1, "seed": 1.0}),
        "RandomNormalLike": lambda: h._add("RandomNormalLike", [x48()],
                                           {"seed": 1.0}),
        "RandomUniformLike": lambda: h._add("RandomUniformLike", [x48()],
                                            {"seed": 1.0}),
        "Bernoulli": lambda: h._add(
            "Bernoulli", [h.input((4, 8), name="x")], {"seed": 1.0}),
        "ReduceMean": lambda: h._add("ReduceMean", [x48()],
                                     {"axes": [1], "keepdims": 1}),
        "ReduceSum": lambda: h._add("ReduceSum", [x48()],
                                    {"axes": [1], "keepdims": 0}),
        "ReduceMax": lambda: h._add("ReduceMax", [x48()],
                                    {"axes": [0], "keepdims": 1}),
        "ReduceMin": lambda: h._add("ReduceMin", [x48()],
                                    {"axes": [0], "keepdims": 1}),
        "ReduceProd": lambda: h._add("ReduceProd", [x48()],
                                     {"axes": [1], "keepdims": 1}),
        "ReduceL1": lambda: h._add("ReduceL1", [x48()],
                                   {"axes": [1], "keepdims": 1}),
        "ReduceL2": lambda: h._add("ReduceL2", [x48()],
                                   {"axes": [1], "keepdims": 1}),
        "ReduceLogSum": lambda: h._add(
            "ReduceLogSum", [h.input((4, 8), name="x")],
            {"axes": [1], "keepdims": 1}),
        "ReduceLogSumExp": lambda: h._add("ReduceLogSumExp", [x48()],
                                          {"axes": [1], "keepdims": 1}),
        "ReduceSumSquare": lambda: h._add("ReduceSumSquare", [x48()],
                                          {"axes": [1], "keepdims": 1}),
        "ReluBackward": lambda: h._add(
            "ReluBackward", [x48(), h.weight(_f(rng, 4, 8)),
                             h.weight(_f(rng, 4, 8))], {}),
        "SigmoidBackward": lambda: h._add(
            "SigmoidBackward", [x48(), h.weight(_f(rng, 4, 8)),
                                h.weight(_f(rng, 4, 8))], {}),
        "TanhBackward": lambda: h._add(
            "TanhBackward", [x48(), h.weight(_f(rng, 4, 8)),
                             h.weight(_f(rng, 4, 8))], {}),
        "Det": lambda: h._add("Det", [h.input((3, 3), name="x")], {}),
    }
    builders["PRelu"] = lambda: h._add(
        "PRelu", [x48(), h.weight(rng.uniform(0.1, 0.3, (8,)).astype(F))],
        {})
    # collectives: one-input passthrough builders
    for c in STRUCTURAL_ONLY:
        if c == "AllGather":
            builders[c] = lambda c=c: h._add(c, [x48()], {"world_size": 2},
                                             n_outputs=2)
        elif c == "Broadcast":
            builders[c] = lambda c=c: h._add(c, [x48()], {"root": 0})
        elif c == "AllToAll":
            builders[c] = lambda c=c: h._add(
                c, [x48()], {"world_size": 2, "split_axis": 0,
                             "concat_axis": 1})
        elif c == "ReduceScatterSum":
            builders[c] = lambda c=c: h._add(
                c, [x48()], {"world_size": 2, "axis": 0})
        else:
            builders[c] = lambda c=c: h._add(c, [x48()], {})

    if op_type not in builders:
        raise KeyError(op_type)
    builders[op_type]()
    feeds = {}
    for t in h.graph.inputs():
        if t.dtype == dt.FLOAT32:
            feeds[t.name] = (rng.uniform(0.1, 0.9, t.shape).astype(F)
                             if op_type in ("ReduceLogSum", "Bernoulli")
                             else _f(rng, *t.shape))
        else:
            feeds[t.name] = np.zeros(t.shape, t.dtype.np())
    return feeds


ALL_OPS = sorted(set(LOWERINGS) - set(EXCLUDED))


def test_sweep_covers_all_registered_ops():
    """Every lowerable op is either swept or on the documented exclusion
    list — no silent gaps."""
    assert set(EXCLUDED) <= set(LOWERINGS)
    for op in ALL_OPS:
        h = GraphHandler()
        _build(op, h, np.random.default_rng(0))   # raises KeyError if missing


@pytest.mark.parametrize("op_type", ALL_OPS)
def test_onnx_roundtrip_op(op_type, rng):
    h = GraphHandler()
    feeds = _build(op_type, h, rng)
    h.graph.infer_output_roles()

    structural = op_type in STRUCTURAL_ONLY
    if not structural:
        ref = h.run(feeds, return_numpy=True)

    model = export_onnx(h.graph, name=f"sweep_{op_type}")
    stub = OnnxStub(model.serialize())

    types = [op.op_type for op in stub.handler.graph.operators]
    # a fully constant graph may legitimately fold away at import; with a
    # fed input the op must survive
    aliases = {"Upsample": "Resize"}    # importer canonicalizes
    if not structural and feeds and op_type != "Shape":
        # (Shape folds to a constant — static shapes are known at import)
        want = aliases.get(op_type, op_type)
        assert want in types, f"{op_type} lost in round-trip: {types}"
    if structural:
        return
    got = stub.run(feeds, return_numpy=True)
    assert set(got) == set(ref), (op_type, set(got), set(ref))
    for key in ref:
        if op_type in RANDOM_OPS:
            assert got[key].shape == ref[key].shape
            assert got[key].dtype == ref[key].dtype
        else:
            np.testing.assert_allclose(got[key], ref[key], rtol=1e-4,
                                       atol=1e-4, err_msg=op_type)
