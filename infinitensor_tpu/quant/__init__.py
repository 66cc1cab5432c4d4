from infinitensor_tpu.quant.weight_only import (
    QuantizedLinear, quantize_weight, dequantize_weight, wo_matmul,
)

__all__ = ["QuantizedLinear", "quantize_weight", "dequantize_weight",
           "wo_matmul"]
