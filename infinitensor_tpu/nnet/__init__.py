"""EinNet/NNET analog: tensor-comprehension expression IR + derivation.

The reference's src/nnet is a C++ expression IR (RangeOp/Subscript/Tensor/
BinaryOp) with rule-based derivation producing library-call matches and
MemBound residue ops. Here the expression IR evaluates directly with
jax.numpy (evaluator.py) — the "TVM JIT" of the reference collapses into
XLA compilation of the evaluated expression.
"""

from infinitensor_tpu.nnet.expr import (  # noqa: F401
    Access, BinOp, Comprehension, Const, Func, TensorRef, Var, fresh_var,
)
from infinitensor_tpu.nnet.derivator import (  # noqa: F401
    Candidate, Derivator, derive_op_program,
)
from infinitensor_tpu.nnet.rules import Program, Stage, match_routine  # noqa: F401
from infinitensor_tpu.nnet.nmutator import NMutator  # noqa: F401
