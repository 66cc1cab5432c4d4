"""Native model zoo (the analog of the reference's examples/python model set:
resnet/densenet/inception inference + llama_kvcache_inference, rebuilt as
first-class TPU-native model definitions)."""

from infinitensor_tpu.models.llama import (
    LlamaConfig, init_llama_params, quantize_llama_params, llama_prefill,
    llama_decode_step, init_kv_cache,
)

__all__ = [
    "LlamaConfig", "init_llama_params", "quantize_llama_params",
    "llama_prefill", "llama_decode_step", "init_kv_cache",
]
