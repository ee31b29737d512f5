"""Pure-functional DSP kernels (batched, jit-friendly)."""
