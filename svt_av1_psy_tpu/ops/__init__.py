"""Device (TPU/XLA) compute kernels — the L1 DSP-layer analog.

The reference implements this layer as ~264k LoC of per-ISA SIMD
(Source/Lib/ASM_*); here each kernel family is a batched jnp/Pallas function
over superblock tensors, traced once under jit and fused by XLA.
"""
