"""Vision model e2e parity vs hand-built torch oracles — the offline analog
of the reference's CI model set (ResNet18-v2 / DenseNet / Inception /
EfficientNet vs onnxruntime, build.yml:77-88)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from infinitensor_tpu.models import vision as V


def _bn(x, p, name, relu=False):
    out = F.batch_norm(x, torch.from_numpy(p[name + ".mean"]),
                       torch.from_numpy(p[name + ".var"]),
                       torch.from_numpy(p[name + ".scale"]),
                       torch.from_numpy(p[name + ".bias"]), eps=1e-5)
    return F.relu(out) if relu else out


def torch_resnet18(p, x):
    x = torch.from_numpy(x)
    t = F.conv2d(x, torch.from_numpy(p["stem.w"]), padding=3, stride=2)
    t = _bn(t, p, "stem.bn", relu=True)
    t = F.max_pool2d(t, 3, stride=2, padding=1)
    chans = [64, 64, 128, 256, 512]
    for stage in range(4):
        cin, cout = chans[stage], chans[stage + 1]
        stride = 1 if stage == 0 else 2
        for blk in range(2):
            base = f"s{stage}.b{blk}"
            s = stride if blk == 0 else 1
            pre = _bn(t, p, base + ".bn1", relu=True)
            if blk == 0 and (cin != cout or stage > 0):
                short = F.conv2d(pre, torch.from_numpy(p[base + ".down.w"]),
                                 stride=s)
            else:
                short = t
            u = F.conv2d(pre, torch.from_numpy(p[base + ".conv1.w"]),
                         padding=1, stride=s)
            u = _bn(u, p, base + ".bn2", relu=True)
            u = F.conv2d(u, torch.from_numpy(p[base + ".conv2.w"]), padding=1)
            t = short + u
    t = _bn(t, p, "final.bn", relu=True)
    t = F.adaptive_avg_pool2d(t, 1).flatten(1)
    return (t @ torch.from_numpy(p["fc.w"])
            + torch.from_numpy(p["fc.b"])).numpy()


def test_resnet18_parity(rng):
    p = V.init_resnet18_params(rng, num_classes=16)
    h = V.build_resnet18(p, batch=1, image=64, num_classes=16)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32)
    got = h.run({"input": x}, return_numpy=True)
    with torch.no_grad():
        ref = torch_resnet18(p, x)
    out = list(got.values())[0]
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_densenet_runs(rng):
    p = V.init_densenet_params(rng, growth=8, block_layers=(2, 2),
                               num_classes=10, init_c=16)
    h = V.build_densenet(p, batch=1, image=32, growth=8,
                         block_layers=(2, 2), num_classes=10, init_c=16)
    x = rng.standard_normal((1, 3, 32, 32), dtype=np.float32)
    got = h.run({"input": x}, return_numpy=True)
    out = list(got.values())[0]
    assert out.shape == (1, 10) and np.isfinite(out).all()


def test_inception_block_parity(rng):
    from infinitensor_tpu.core.handler import GraphHandler
    p = V.init_inception_block_params(rng, cin=16, b1=8, b3r=8, b3=12,
                                      b5r=4, b5=8, bp=8)
    h = GraphHandler()
    x = h.input((1, 16, 14, 14), name="x")
    w = {k: h.weight(v, name=k) for k, v in p.items()}
    V.build_inception_block(h, x, w)
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((1, 16, 14, 14), dtype=np.float32)
    got = list(h.run({"x": x_np}, return_numpy=True).values())[0]
    # torch oracle
    xt = torch.from_numpy(x_np)
    with torch.no_grad():
        p1 = F.relu(F.conv2d(xt, torch.from_numpy(p["b1"])))
        p3 = F.relu(F.conv2d(F.relu(F.conv2d(xt, torch.from_numpy(p["b3r"]))),
                             torch.from_numpy(p["b3"]), padding=1))
        p5 = F.relu(F.conv2d(xt, torch.from_numpy(p["b5r"])))
        p5 = F.relu(F.conv2d(p5, torch.from_numpy(p["b5a"]), padding=1))
        p5 = F.relu(F.conv2d(p5, torch.from_numpy(p["b5b"]), padding=1))
        pp = F.relu(F.conv2d(F.max_pool2d(xt, 3, stride=1, padding=1),
                             torch.from_numpy(p["bp"])))
        ref = torch.cat([p1, p3, p5, pp], dim=1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_mbconv_block_parity(rng):
    from infinitensor_tpu.core.handler import GraphHandler
    p = V.init_mbconv_params(rng, cin=8, cout=8, expand=4, k=3)
    h = GraphHandler()
    x = h.input((1, 8, 16, 16), name="x")
    w = {k: h.weight(v, name=k) for k, v in p.items()}
    V.build_mbconv(h, x, w, stride=1)
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((1, 8, 16, 16), dtype=np.float32)
    got = list(h.run({"x": x_np}, return_numpy=True).values())[0]
    xt = torch.from_numpy(x_np)

    def tbn(t, name):
        return F.batch_norm(t, torch.from_numpy(p[name + ".mean"]),
                            torch.from_numpy(p[name + ".var"]),
                            torch.from_numpy(p[name + ".scale"]),
                            torch.from_numpy(p[name + ".bias"]), eps=1e-5)

    with torch.no_grad():
        t = F.relu(tbn(F.conv2d(xt, torch.from_numpy(p["expand.w"])),
                       "expand.bn"))
        t = F.relu(tbn(F.conv2d(t, torch.from_numpy(p["dw.w"]), padding=1,
                                groups=t.shape[1]), "dw.bn"))
        t = tbn(F.conv2d(t, torch.from_numpy(p["proj.w"])), "proj.bn")
        ref = (xt + t).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_resnet_onnx_roundtrip(rng):
    """ResNet through export -> reimport (the ONNX e2e path the reference CI
    drives with downloaded models)."""
    from infinitensor_tpu.onnx.exporter import export_onnx
    from infinitensor_tpu.onnx.importer import OnnxStub
    p = V.init_resnet18_params(rng, num_classes=8)
    h = V.build_resnet18(p, batch=1, image=32, num_classes=8)
    x = rng.standard_normal((1, 3, 32, 32), dtype=np.float32)
    ref = h.run({"input": x}, return_numpy=True)
    stub = OnnxStub(export_onnx(h.graph, "resnet18").serialize())
    got = stub.run({"input": x}, return_numpy=True)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-4)


def test_inception_v2_full_model(rng):
    """Full BN-Inception (v2) graph: run + ONNX round-trip execution
    equality — the multi-branch concat topology is what stresses the
    importer/exporter (reference CI model set)."""
    from infinitensor_tpu.onnx.exporter import export_onnx
    from infinitensor_tpu.onnx.importer import OnnxStub
    p = V.init_inception_v2_params(rng, num_classes=8)
    h = V.build_inception_v2(p, batch=1, image=64, num_classes=8)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32)
    ref = h.run({"input": x}, return_numpy=True)
    (out,) = ref.values()
    assert out.shape == (1, 8) and np.isfinite(out).all()
    stub = OnnxStub(export_onnx(h.graph, "inception_v2").serialize())
    got = stub.run({"input": x}, return_numpy=True)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-4)


def test_efficientnet_lite4_full_model(rng):
    """Full EfficientNet-Lite4 stage table (30 MBConv blocks): run + ONNX
    round-trip execution equality (grouped depthwise convs through the
    codec)."""
    from infinitensor_tpu.onnx.exporter import export_onnx
    from infinitensor_tpu.onnx.importer import OnnxStub
    p = V.init_efficientnet_lite4_params(rng, num_classes=8)
    h = V.build_efficientnet_lite4(p, batch=1, image=64, num_classes=8)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32)
    ref = h.run({"input": x}, return_numpy=True)
    (out,) = ref.values()
    assert out.shape == (1, 8) and np.isfinite(out).all()
    stub = OnnxStub(export_onnx(h.graph, "efficientnet_lite4").serialize())
    got = stub.run({"input": x}, return_numpy=True)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-4)
