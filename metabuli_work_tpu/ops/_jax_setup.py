"""Enable 64-bit types before any kernel code touches JAX.

Metamers are 64-bit words (40-bit AA part + 24-bit DNA part); the
single-array index probe compares full u64 values.  XLA:TPU emulates
64-bit integer ops on 32-bit lanes — correct, ~2x the ALU cost; the
planned Pallas kernels use a decomposed 2x u32 representation instead.
"""

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: first compile per shape through the axon
# tunnel costs 90-400s; cached reloads make repeated runs (tests, bench,
# CLI invocations) start in seconds.
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without these knobs
    pass
