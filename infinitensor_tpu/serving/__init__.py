from infinitensor_tpu.serving.kvcache import (
    clone_kv_slot, clear_kv_slot, write_prefill_into_slot,
)
from infinitensor_tpu.serving.engine import ServingEngine, Request

__all__ = ["ServingEngine", "Request", "clone_kv_slot", "clear_kv_slot",
           "write_prefill_into_slot"]
