"""Pallas TPU kernels. Each kernel has a pure-JAX twin in models/ or ops/
that serves as its correctness oracle; kernels are only adopted into
production paths on a measured on-chip win (PERF_NOTES.md records the A/Bs,
including negative results)."""
