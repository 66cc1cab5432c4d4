from infinitensor_tpu.ops.shape_rules import infer_shapes, SHAPE_RULES
from infinitensor_tpu.ops.lowering import lower_op, LOWERINGS

__all__ = ["infer_shapes", "SHAPE_RULES", "lower_op", "LOWERINGS"]
