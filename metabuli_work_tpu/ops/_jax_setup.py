"""Enable 64-bit types before any kernel code touches JAX.

Metamers are 64-bit words (40-bit AA part + 24-bit DNA part); the
single-array index probe compares full u64 values.  XLA:TPU emulates
64-bit integer ops on 32-bit lanes — correct, ~2x the ALU cost; the
planned Pallas kernels use a decomposed 2x u32 representation instead.
"""

import jax

jax.config.update("jax_enable_x64", True)
