from infinitensor_tpu.onnx.importer import OnnxStub, import_onnx
from infinitensor_tpu.onnx.exporter import export_onnx
from infinitensor_tpu.onnx import proto

__all__ = ["OnnxStub", "import_onnx", "export_onnx", "proto"]
