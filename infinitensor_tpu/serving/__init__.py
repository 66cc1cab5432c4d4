from infinitensor_tpu.serving.kvcache import (
    clone_kv_slot, clear_kv_slot, write_prefill_into_slot,
)
from infinitensor_tpu.serving.engine import ServingEngine, Request
from infinitensor_tpu.serving.paged_engine import PagedServingEngine
from infinitensor_tpu.serving.speculative import (
    ModelDraft, PromptLookupDraft, speculative_generate,
)

__all__ = ["ServingEngine", "PagedServingEngine", "Request",
           "clone_kv_slot", "clear_kv_slot", "write_prefill_into_slot",
           "speculative_generate", "ModelDraft", "PromptLookupDraft"]
