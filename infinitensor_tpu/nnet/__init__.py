"""EinNet/NNET analog: tensor-comprehension expression IR + derivation.

The reference's src/nnet is a C++ expression IR (RangeOp/Subscript/Tensor/
BinaryOp) with rule-based derivation producing library-call matches and
MemBound residue ops. Here the expression IR evaluates directly with
jax.numpy (evaluator.py) — the "TVM JIT" of the reference collapses into
XLA compilation of the evaluated expression.
"""
