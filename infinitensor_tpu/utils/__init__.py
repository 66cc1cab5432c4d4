from infinitensor_tpu.utils.platform import is_tpu

__all__ = ["is_tpu"]
