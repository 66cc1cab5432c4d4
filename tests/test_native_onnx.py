"""Native ONNX wire-scanner fast path vs the pure-Python parser.

The native scanner (native/onnx_wire.cc) indexes initializers in one C++
pass and the loader maps payloads zero-copy; both paths must agree on every
payload encoding ONNX uses (reference keeps weight ingestion fully native:
src/ffi/ffi_infinitensor.cc:478-541).
"""

import numpy as np
import pytest

from infinitensor_tpu.onnx import proto
from infinitensor_tpu.native import onnx_wire


def _model_with_inits(inits):
    g = proto.GraphProto(name="g", initializer=inits)
    g.input = [proto.ValueInfoProto.make("x", 1, (2, 3))]
    g.output = [proto.ValueInfoProto.make("y", 1, (2, 3))]
    g.node = [proto.NodeProto(input=["x"], output=["y"], op_type="Relu")]
    return proto.ModelProto(graph=g)


def _payload_variants():
    variants = [
        proto.TensorProto.from_numpy(
            np.arange(24, dtype=np.float32).reshape(2, 3, 4), "raw_f32"),
        proto.TensorProto.from_numpy(
            np.arange(6, dtype=np.int8).reshape(2, 3), "raw_i8"),
        proto.TensorProto.from_numpy(
            np.arange(4, dtype=np.float16), "raw_f16"),
        # typed (non-raw) payloads
        proto.TensorProto(dims=[3], data_type=1, name="f32_list",
                          float_data=[1.0, -2.5, 3.25]),
        proto.TensorProto(dims=[4], data_type=7, name="i64_list",
                          int64_data=[-1, 2, -300, 4000]),
        proto.TensorProto(dims=[2], data_type=11, name="f64_list",
                          double_data=[1.5, -0.25]),
        proto.TensorProto(dims=[3], data_type=6, name="i32_list",
                          int32_data=[-7, 8, 9]),
        proto.TensorProto(dims=[0], data_type=1, name="empty"),
    ]
    return variants


def test_native_scan_available():
    assert onnx_wire.native_available()


def test_scan_indexes_all_initializers():
    m = _model_with_inits(_payload_variants())
    data = m.serialize()
    scan = onnx_wire.scan_model(data)
    assert scan is not None
    names = [d.name for d in scan.initializers]
    assert names == [t.name for t in _payload_variants()]
    by_name = {d.name: d for d in scan.initializers}
    assert by_name["raw_f32"].data_kind == onnx_wire.KIND_RAW
    assert tuple(by_name["raw_f32"].dims) == (2, 3, 4)
    assert by_name["f32_list"].data_kind == onnx_wire.KIND_FLOAT
    assert by_name["i64_list"].data_kind == onnx_wire.KIND_INT64


def test_lazy_load_matches_python_parse():
    m = _model_with_inits(_payload_variants())
    data = m.serialize()
    fast = proto.load_model(data)
    slow = proto.ModelProto.parse(data)
    assert isinstance(fast.graph.initializer[0], proto.LazyTensorProto)
    assert fast.ir_version == slow.ir_version
    assert fast.opset_version() == slow.opset_version()
    assert [n.op_type for n in fast.graph.node] == \
        [n.op_type for n in slow.graph.node]
    for lt, st in zip(fast.graph.initializer, slow.graph.initializer):
        assert lt.name == st.name
        assert lt.dims == st.dims
        assert lt.data_type == st.data_type
        np.testing.assert_array_equal(np.asarray(lt.to_numpy()),
                                      np.asarray(st.to_numpy()))


def test_lazy_raw_is_zero_copy():
    arr = np.arange(1024, dtype=np.float32)
    m = _model_with_inits([proto.TensorProto.from_numpy(arr, "w")])
    data = m.serialize()
    fast = proto.load_model(data)
    out = fast.graph.initializer[0].to_numpy()
    assert not out.flags.writeable  # view into the model buffer
    np.testing.assert_array_equal(out, arr)


def test_lazy_serialize_round_trips():
    m = _model_with_inits(_payload_variants())
    data = m.serialize()
    fast = proto.load_model(data)
    re = proto.ModelProto.parse(fast.serialize())
    for lt, st in zip(fast.graph.initializer, re.graph.initializer):
        assert lt.name == st.name
        np.testing.assert_array_equal(np.asarray(lt.to_numpy()),
                                      np.asarray(st.to_numpy()))


def test_importer_runs_on_lazy_model(tmp_path):
    """End-to-end: save to disk, load via the fast path, import + execute."""
    from infinitensor_tpu.onnx.importer import OnnxStub

    w = np.random.RandomState(0).randn(8, 4).astype(np.float32)
    g = proto.GraphProto(name="mm", initializer=[
        proto.TensorProto.from_numpy(w, "w")])
    g.input = [proto.ValueInfoProto.make("x", 1, (2, 8))]
    g.output = [proto.ValueInfoProto.make("y", 1, (2, 4))]
    g.node = [proto.NodeProto(input=["x", "w"], output=["y"],
                              op_type="MatMul")]
    path = tmp_path / "m.onnx"
    proto.save_model(proto.ModelProto(graph=g), str(path))

    stub = OnnxStub(str(path))
    assert isinstance(stub.model.graph.initializer[0],
                      proto.LazyTensorProto)
    x = np.random.RandomState(1).randn(2, 8).astype(np.float32)
    out = stub.run({"x": x}, return_numpy=True)
    np.testing.assert_allclose(out["y"], x @ w, rtol=1e-5, atol=1e-5)
