"""Shape/dtype inference tests — the analog of the reference's
test/operators/* suite (pure, no device)."""

import numpy as np
import pytest

from infinitensor_tpu.core import dtype as dt
from infinitensor_tpu.core.handler import GraphHandler


@pytest.fixture
def h():
    return GraphHandler()


def test_conv(h):
    # reference test/operators/test_conv.cc style
    x = h.input((1, 3, 224, 224))
    w = h.weight(np.zeros((64, 3, 7, 7), np.float32))
    y = h.conv(x, w, pads=(3, 3), strides=(2, 2))
    assert y.shape == (1, 64, 112, 112)


def test_conv_grouped_dilated(h):
    x = h.input((1, 32, 56, 56))
    w = h.weight(np.zeros((32, 1, 3, 3), np.float32))
    y = h.conv(x, w, pads=(2, 2), dilations=(2, 2), group=32)
    assert y.shape == (1, 32, 56, 56)


def test_conv_transpose(h):
    x = h.input((1, 16, 8, 8))
    w = h.weight(np.zeros((16, 8, 2, 2), np.float32))
    y = h.conv_transpose(x, w, strides=(2, 2))
    assert y.shape == (1, 8, 16, 16)


def test_matmul_broadcast(h):
    a = h.input((3, 1, 5, 7))
    b = h.input((4, 7, 2))
    y = h.matmul(a, b)
    assert y.shape == (3, 4, 5, 2)


def test_matmul_trans(h):
    a = h.input((7, 5))
    b = h.input((7, 2))
    y = h.matmul(a, b, trans_a=True)
    assert y.shape == (5, 2)


def test_pool(h):
    x = h.input((1, 64, 112, 112))
    y = h.max_pool(x, kernel=(3, 3), strides=(2, 2), pads=(1, 1))
    assert y.shape == (1, 64, 56, 56)


def test_pool_ceil_mode(h):
    x = h.input((1, 1, 7, 7))
    y = h.max_pool(x, kernel=(2, 2), strides=(2, 2), ceil_mode=1)
    assert y.shape == (1, 1, 4, 4)


def test_global_avg_pool(h):
    x = h.input((2, 32, 7, 7))
    assert h.global_avg_pool(x).shape == (2, 32, 1, 1)


def test_binary_broadcast(h):
    a = h.input((2, 3, 4))
    b = h.input((3, 1))
    assert h.add(a, b).shape == (2, 3, 4)


def test_compare_dtype(h):
    a = h.input((2, 2))
    b = h.input((2, 2))
    y = h._add("Less", [a, b], {})
    assert y.dtype is dt.BOOL


def test_reshape_neg_one(h):
    x = h.input((2, 3, 4))
    assert h.reshape(x, (-1, 4)).shape == (6, 4)
    assert h.reshape(x, (0, -1)).shape == (2, 12)


def test_flatten(h):
    x = h.input((2, 3, 4, 5))
    assert h.flatten(x, axis=2).shape == (6, 20)
    assert h.flatten(x, axis=0).shape == (1, 120)


def test_squeeze_unsqueeze(h):
    x = h.input((1, 3, 1, 4))
    assert h.squeeze(x).shape == (3, 4)
    assert h.squeeze(x, axes=[0]).shape == (3, 1, 4)
    y = h.input((3, 4))
    assert h.unsqueeze(y, axes=[0, 3]).shape == (1, 3, 4, 1)


def test_transpose_default_reverse(h):
    x = h.input((2, 3, 4))
    assert h.transpose(x).shape == (4, 3, 2)
    assert h.transpose(x, perm=[0, 2, 1]).shape == (2, 4, 3)


def test_concat_split(h):
    a = h.input((2, 3))
    b = h.input((2, 5))
    y = h.concat([a, b], axis=1)
    assert y.shape == (2, 8)
    parts = h.split(y, axis=1, num_or_sizes=[3, 5])
    assert [p.shape for p in parts] == [(2, 3), (2, 5)]
    parts2 = h.split(y, axis=1, num_or_sizes=2)
    assert [p.shape for p in parts2] == [(2, 4), (2, 4)]


def test_slice_negative_and_steps(h):
    x = h.input((10, 20))
    y = h.slice(x, starts=[1, -5], ends=[9, 20], axes=[0, 1], steps=[2, 1])
    assert y.shape == (4, 5)


def test_pad(h):
    x = h.input((1, 3, 4, 4))
    y = h.pad(x, pads=[0, 0, 1, 1, 0, 0, 1, 1])
    assert y.shape == (1, 3, 6, 6)


def test_gather(h):
    data = h.input((5, 7))
    idx = h.tensor((3, 2), dt.INT64)
    assert h.gather(data, idx, axis=0).shape == (3, 2, 7)
    assert h.gather(data, idx, axis=1).shape == (5, 3, 2)


def test_reduce(h):
    x = h.input((2, 3, 4))
    assert h.reduce_mean(x, axes=[1]).shape == (2, 1, 4)
    assert h.reduce_sum(x, axes=[1], keepdims=0).shape == (2, 4)
    assert h.reduce_mean(x).shape == (1, 1, 1)


def test_expand_where(h):
    x = h.input((3, 1))
    y = h.expand(x, (2, 1, 6))
    assert y.shape == (2, 3, 6)
    cond = h.tensor((2, 3, 6), dt.BOOL)
    z = h.where(cond, y, y)
    assert z.shape == (2, 3, 6)


def test_attention_kvcache_shapes(h):
    # reference test/operators/test_attention_kvcache style: [B,H,S,D]
    kc = h.input((1, 8, 128, 64))
    vc = h.input((1, 8, 128, 64))
    q = h.input((1, 8, 1, 64))
    k = h.input((1, 8, 1, 64))
    v = h.input((1, 8, 1, 64))
    pos = h.tensor((1,), dt.INT32)
    out, kco, vco = h.attention_kvcache(kc, vc, q, k, v, pos)
    assert out.shape == (1, 8, 1, 64)
    assert kco.shape == kc.shape and vco.shape == vc.shape


def test_rope(h):
    pos = h.tensor((1, 5), dt.INT32)
    x = h.input((1, 5, 512))
    assert h.rope(pos, x, dim_head=64).shape == (1, 5, 512)


def test_g2bmm_gbmm(h):
    a = h.input((8, 100, 64))
    b = h.input((8, 100, 64))
    band = h.g2bmm(a, b, width=10)
    assert band.shape == (8, 100, 21)
    out = h.gbmm(band, b)
    assert out.shape == (8, 100, 64)


def test_comm_ops(h):
    # reference test/operators/test_all_reduce.cc:7-49
    x = h.input((4, 4))
    assert h.all_reduce_sum(x).shape == (4, 4)
    outs = h.all_gather(x, world_size=4)
    assert len(outs) == 4 and outs[0].shape == (4, 4)
    assert h.broadcast(x).shape == (4, 4)
    r = h.recv(source=0, destination=1, shape=(2, 2), dtype=dt.FLOAT32)
    assert r.shape == (2, 2)


def test_quant_ops(h):
    x = h.input((2, 8))
    scale = h.weight(np.float32(0.1).reshape(()))
    zp = h.weight(np.zeros((), np.int8))
    q = h.quantize_linear(x, scale, zp)
    assert q.dtype is dt.INT8
    dq = h.dequantize_linear(q, scale, zp)
    assert dq.dtype is dt.FLOAT32 and dq.shape == (2, 8)


def test_cast(h):
    x = h.input((2, 2))
    assert h.cast(x, dt.INT8).dtype is dt.INT8


def test_depth_to_space(h):
    x = h.input((1, 8, 2, 3))
    assert h.depth_to_space(x, 2).shape == (1, 2, 4, 6)


def test_output_spec_mismatch_raises(h):
    x = h.input((2, 4))
    bad = h.tensor((3, 3))
    with pytest.raises(ValueError):
        h.relu(x, output=bad)


# -- straggler ops (reference op_type.h extras) --------------------------------

def test_straggler_op_execution(rng):
    """Each newly added op: shape rule agrees with executed result and the
    numerics match a numpy/jnp oracle."""
    import numpy as np
    import jax.numpy as jnp
    from infinitensor_tpu.core.handler import GraphHandler
    from infinitensor_tpu.core import dtype as dt

    def run_single(op_type, arrs, attrs, n_out=1):
        h = GraphHandler()
        ins = [h.input(a.shape, dtype=dt.DataType.from_numpy(a.dtype),
                       name=f"x{i}") for i, a in enumerate(arrs)]
        h._add(op_type, ins, attrs, n_outputs=n_out)
        h.graph.infer_output_roles()
        feeds = {f"x{i}": a for i, a in enumerate(arrs)}
        out = h.run(feeds, return_numpy=True)
        return list(out.values())

    x = rng.standard_normal((2, 3, 3)).astype(np.float32)
    (d,) = run_single("Det", [x], {})
    np.testing.assert_allclose(d, np.linalg.det(x), rtol=1e-4, atol=1e-5)

    (e,) = run_single("Extend", [x], {"dim": 1, "num": 2})
    assert e.shape == (2, 9, 3)
    np.testing.assert_allclose(e, np.concatenate([x] * 3, axis=1))

    v, i = run_single("TopK", [x], {"k": 2, "axis": -1}, n_out=2)
    ref = np.sort(x, axis=-1)[..., ::-1][..., :2]
    np.testing.assert_allclose(v, ref, rtol=1e-5)

    (c,) = run_single("CumSum", [x], {"axis": 1})
    np.testing.assert_allclose(c, np.cumsum(x, axis=1), rtol=1e-4, atol=1e-5)

    (t,) = run_single("Trilu", [x], {"upper": 0})
    np.testing.assert_allclose(t, np.tril(x))

    idx = rng.integers(0, 5, (2, 4)).astype(np.int32)
    (oh,) = run_single("OneHot", [idx], {"depth": 5})
    assert oh.shape == (2, 4, 5)
    np.testing.assert_allclose(oh.argmax(-1), idx)

    (l1,) = run_single("ReduceL1", [x], {"axes": [2], "keepdims": 1})
    np.testing.assert_allclose(l1, np.abs(x).sum(2, keepdims=True),
                               rtol=1e-4, atol=1e-5)

    for name in ("Tan", "Asin", "Acos", "Atan", "Sinh", "Cosh",
                 "Softsign", "Sign"):
        y = rng.uniform(-0.9, 0.9, (4, 4)).astype(np.float32)
        (got,) = run_single(name, [y], {})
        ref = {"Tan": np.tan, "Asin": np.arcsin, "Acos": np.arccos,
               "Atan": np.arctan, "Sinh": np.sinh, "Cosh": np.cosh,
               "Softsign": lambda v: v / (1 + np.abs(v)),
               "Sign": np.sign}[name](y)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_activation_backward_matches_torch(rng):
    import numpy as np
    torch = __import__("pytest").importorskip("torch")
    from infinitensor_tpu.core.handler import GraphHandler
    from infinitensor_tpu.core import dtype as dt

    x_np = rng.standard_normal((3, 5)).astype(np.float32)
    dy_np = rng.standard_normal((3, 5)).astype(np.float32)
    for name, tfn in (("ReluBackward", torch.relu),
                      ("SigmoidBackward", torch.sigmoid),
                      ("TanhBackward", torch.tanh)):
        xt = torch.tensor(x_np, requires_grad=True)
        yt = tfn(xt)
        yt.backward(torch.tensor(dy_np))
        ref = xt.grad.numpy()
        y_np = yt.detach().numpy()
        h = GraphHandler()
        y = h.input((3, 5), name="y")
        dy = h.input((3, 5), name="dy")
        xx = h.input((3, 5), name="x")
        h._add(name, [y, dy, xx], {})
        h.graph.infer_output_roles()
        out = h.run({"y": y_np, "dy": dy_np, "x": x_np}, return_numpy=True)
        np.testing.assert_allclose(list(out.values())[0], ref,
                                   rtol=1e-4, atol=1e-5)
