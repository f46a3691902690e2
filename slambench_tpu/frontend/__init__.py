"""Front-ends: the headless benchmark driver (reference:
kfusion/src/benchmark.cpp) — entry point
``python -m slambench_tpu.frontend.benchmark``."""
