from infinitensor_tpu.utils.platform import is_tpu
from infinitensor_tpu.utils.convert import (
    float_to_fp16, fp16_to_float, float_to_bf16, bf16_to_float)

__all__ = [
    "is_tpu",
    "float_to_fp16", "fp16_to_float", "float_to_bf16", "bf16_to_float",
]
