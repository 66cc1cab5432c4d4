"""Hot-path TPU kernels (Pallas) with pure-JAX reference implementations.

The reference implementations (``*_ref``) double as numerics oracles in tests,
mirroring the reference repo's native-CPU kernels used as oracles for CUDA
kernels (reference test/kernels/cuda/* pattern).
"""
