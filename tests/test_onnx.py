"""ONNX frontend tests: wire codec, import, constant folding, round-trip
(the analog of reference pyinfinitensor/tests/test_onnx.py)."""

import numpy as np
import pytest

from infinitensor_tpu.core import dtype as dt
from infinitensor_tpu.core.handler import GraphHandler
from infinitensor_tpu.onnx import proto
from infinitensor_tpu.onnx.exporter import export_onnx
from infinitensor_tpu.onnx.importer import OnnxStub


# ---------------------------------------------------------------------------
# proto codec
# ---------------------------------------------------------------------------

def test_varint_roundtrip():
    from infinitensor_tpu.onnx import wire
    for v in [0, 1, 127, 128, 300, 2**31, 2**60, -1, -64]:
        buf = wire.encode_varint(v)
        dec, pos = wire.decode_varint(buf, 0)
        assert wire.to_signed64(dec) == v
        assert pos == len(buf)


def test_tensorproto_numpy_roundtrip(rng):
    for arr in [
        rng.standard_normal((3, 4)).astype(np.float32),
        rng.integers(-5, 5, (2, 2)).astype(np.int64),
        rng.integers(0, 2, (4,)).astype(np.bool_),
        np.float16(rng.standard_normal((2, 3))),
    ]:
        tp = proto.TensorProto.from_numpy(arr, "t")
        tp2 = proto.TensorProto.parse(tp.serialize())
        np.testing.assert_array_equal(tp2.to_numpy(), arr)


def test_model_roundtrip_bytes(rng):
    h = GraphHandler()
    x = h.input((2, 4), name="x")
    w = h.weight(rng.standard_normal((4, 8), dtype=np.float32), name="w")
    y = h.relu(h.matmul(x, w))
    h.graph.infer_output_roles()
    m = export_onnx(h.graph, "tiny")
    data = m.serialize()
    m2 = proto.load_model(data)
    assert m2.graph.name == "tiny"
    assert [n.op_type for n in m2.graph.node] == ["MatMul", "Relu"]
    assert m2.graph.initializer[0].name == "w"


# ---------------------------------------------------------------------------
# import + execute round-trips
# ---------------------------------------------------------------------------

def _reimport_and_compare(h, feeds, rtol=1e-4):
    """Export -> parse -> import -> run; compare against direct execution."""
    h.graph.infer_output_roles()
    ref = h.run(feeds, return_numpy=True)
    model = export_onnx(h.graph)
    stub = OnnxStub(model.serialize())
    got = stub.run(feeds, return_numpy=True)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=rtol, atol=1e-4)
    return stub


def test_roundtrip_mlp(rng):
    h = GraphHandler()
    x = h.input((2, 16), name="x")
    w1 = h.weight(rng.standard_normal((16, 32), dtype=np.float32))
    b1 = h.weight(rng.standard_normal((32,), dtype=np.float32))
    y = h.add(h.matmul(x, w1), b1)
    z = h.softmax(h.matmul(h.gelu(y),
                           h.weight(rng.standard_normal((32, 8),
                                                        dtype=np.float32))),
                  axis=-1)
    _reimport_and_compare(h, {"x": rng.standard_normal((2, 16),
                                                       dtype=np.float32)})


def test_roundtrip_convnet(rng):
    h = GraphHandler()
    x = h.input((1, 3, 16, 16), name="x")
    c1 = h.conv(x, h.weight(rng.standard_normal((8, 3, 3, 3),
                                                dtype=np.float32)),
                pads=(1, 1), strides=(2, 2))
    r = h.relu(c1)
    p = h.max_pool(r, kernel=(2, 2), strides=(2, 2))
    f = h.flatten(p, axis=1)
    h.matmul(f, h.weight(rng.standard_normal((8 * 16, 10),
                                             dtype=np.float32)))
    _reimport_and_compare(h, {"x": rng.standard_normal((1, 3, 16, 16),
                                                       dtype=np.float32)})


def test_roundtrip_shape_ops(rng):
    h = GraphHandler()
    x = h.input((2, 3, 8), name="x")
    t = h.transpose(x, perm=[0, 2, 1])
    s = h.slice(t, starts=[0], ends=[4], axes=[1])
    sq = h.unsqueeze(s, axes=[0])
    cc = h.concat([sq, sq], axis=0)
    h.reduce_mean(cc, axes=[3], keepdims=0)
    _reimport_and_compare(h, {"x": rng.standard_normal((2, 3, 8),
                                                       dtype=np.float32)})


def test_roundtrip_llm_ops(rng):
    h = GraphHandler()
    B, H, S, D = 1, 2, 16, 8
    kc = h.input((B, H, S, D), name="kc")
    vc = h.input((B, H, S, D), name="vc")
    q = h.input((B, H, 1, D), name="q")
    k = h.input((B, H, 1, D), name="k")
    v = h.input((B, H, 1, D), name="v")
    pos = h.weight(np.array([3], np.int32), name="pos")
    h.attention_kvcache(kc, vc, q, k, v, pos)
    feeds = {n: rng.standard_normal(t.shape, dtype=np.float32)
             for n, t in [("kc", kc), ("vc", vc), ("q", q), ("k", k),
                          ("v", v)]}
    _reimport_and_compare(h, feeds)


def test_roundtrip_rmsnorm_rope(rng):
    h = GraphHandler()
    x = h.input((1, 4, 128), name="x")
    pos = h.weight(np.arange(4, dtype=np.int32).reshape(1, 4), name="p")
    r = h.rope(pos, x, dim_head=64)
    h.rms_norm(r, h.weight(rng.standard_normal(128, dtype=np.float32)))
    _reimport_and_compare(h, {"x": rng.standard_normal((1, 4, 128),
                                                       dtype=np.float32)})


# ---------------------------------------------------------------------------
# hand-built ONNX models (importer front door)
# ---------------------------------------------------------------------------

def _mk_model(nodes, inputs, outputs, inits=None, opset=17):
    g = proto.GraphProto(name="t", node=nodes, input=inputs, output=outputs,
                         initializer=inits or [])
    m = proto.ModelProto(graph=g)
    m.opset_import = [proto.OperatorSetId(domain="", version=opset)]
    return m


def test_import_gemm_bias(rng):
    a_np = rng.standard_normal((3, 4), dtype=np.float32)
    w_np = rng.standard_normal((5, 4), dtype=np.float32)
    b_np = rng.standard_normal((5,), dtype=np.float32)
    m = _mk_model(
        nodes=[proto.NodeProto(
            input=["a", "w", "b"], output=["y"], op_type="Gemm",
            attribute=[proto.AttributeProto.make("transB", 1),
                       proto.AttributeProto.make("alpha", 1.0)])],
        inputs=[proto.ValueInfoProto.make("a", 1, (3, 4))],
        outputs=[proto.ValueInfoProto.make("y", 1, (3, 5))],
        inits=[proto.TensorProto.from_numpy(w_np, "w"),
               proto.TensorProto.from_numpy(b_np, "b")],
    )
    stub = OnnxStub(m.serialize())
    out = stub.run({"a": a_np}, return_numpy=True)["y"]
    np.testing.assert_allclose(out, a_np @ w_np.T + b_np, rtol=1e-4,
                               atol=1e-5)


def test_import_constant_folding_shape_chain(rng):
    # Shape -> Gather -> Unsqueeze -> Concat -> Reshape : typical
    # transformer shape arithmetic; must fold at import (no runtime ops).
    x_np = rng.standard_normal((2, 6, 4), dtype=np.float32)
    nodes = [
        proto.NodeProto(input=["x"], output=["shp"], op_type="Shape"),
        proto.NodeProto(input=["shp", "i0"], output=["d0"], op_type="Gather",
                        attribute=[proto.AttributeProto.make("axis", 0)]),
        proto.NodeProto(input=["d0"], output=["d0u"], op_type="Unsqueeze",
                        attribute=[proto.AttributeProto.make("axes", [0])]),
        proto.NodeProto(input=["d0u", "minus1"], output=["tgt"],
                        op_type="Concat",
                        attribute=[proto.AttributeProto.make("axis", 0)]),
        proto.NodeProto(input=["x", "tgt"], output=["y"], op_type="Reshape"),
    ]
    m = _mk_model(
        nodes,
        inputs=[proto.ValueInfoProto.make("x", 1, (2, 6, 4))],
        outputs=[proto.ValueInfoProto.make("y", 1, (2, 24))],
        inits=[proto.TensorProto.from_numpy(np.asarray(0, np.int64), "i0"),
               proto.TensorProto.from_numpy(np.asarray([-1], np.int64),
                                            "minus1")],
    )
    stub = OnnxStub(m.serialize())
    ops = [op.op_type for op in stub.handler.graph.operators]
    assert ops == ["Reshape"], f"shape chain not folded: {ops}"
    out = stub.run({"x": x_np}, return_numpy=True)["y"]
    np.testing.assert_array_equal(out, x_np.reshape(2, 24))


def test_import_clip_opset11_inputs(rng):
    x_np = rng.standard_normal((4,), dtype=np.float32)
    m = _mk_model(
        nodes=[proto.NodeProto(input=["x", "lo", "hi"], output=["y"],
                               op_type="Clip")],
        inputs=[proto.ValueInfoProto.make("x", 1, (4,))],
        outputs=[proto.ValueInfoProto.make("y", 1, (4,))],
        inits=[proto.TensorProto.from_numpy(np.asarray(-0.5, np.float32), "lo"),
               proto.TensorProto.from_numpy(np.asarray(0.5, np.float32), "hi")],
    )
    out = OnnxStub(m.serialize()).run({"x": x_np}, return_numpy=True)["y"]
    np.testing.assert_allclose(out, np.clip(x_np, -0.5, 0.5))


def test_import_dynamic_batch_default_dim(rng):
    m = _mk_model(
        nodes=[proto.NodeProto(input=["x"], output=["y"], op_type="Relu")],
        inputs=[proto.ValueInfoProto(
            name="x", tensor_type=proto.TypeProtoTensor(
                1, proto.TensorShapeProto(dim=[
                    proto.Dimension(dim_param="batch"),
                    proto.Dimension(dim_value=4)])))],
        outputs=[proto.ValueInfoProto.make("y", 1, (1, 4))],
    )
    stub = OnnxStub(m.serialize(), fixed_dims={"x": 8})
    assert stub.inputs["x"].shape == (8, 4)
    # and set_input rebinds
    stub.set_input({"x": (2, 4)})
    out = stub.run({"x": np.ones((2, 4), np.float32)}, return_numpy=True)
    assert out["y"].shape == (2, 4)


def test_import_unsupported_op_raises():
    m = _mk_model(
        nodes=[proto.NodeProto(input=["x"], output=["y"],
                               op_type="StringNormalizer")],
        inputs=[proto.ValueInfoProto.make("x", 1, (1,))],
        outputs=[proto.ValueInfoProto.make("y", 1, (1,))],
    )
    with pytest.raises(NotImplementedError, match="StringNormalizer"):
        OnnxStub(m.serialize())


def test_import_cycle_diagnostics():
    m = _mk_model(
        nodes=[proto.NodeProto(input=["b"], output=["a"], op_type="Relu",
                               name="n1"),
               proto.NodeProto(input=["a"], output=["b"], op_type="Relu",
                               name="n2")],
        inputs=[],
        outputs=[proto.ValueInfoProto.make("b", 1, (1,))],
    )
    with pytest.raises(ValueError, match="stuck nodes"):
        OnnxStub(m.serialize())
