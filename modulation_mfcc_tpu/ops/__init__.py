"""Pure-functional DSP ops (JAX device-side, numpy design-time)."""
