"""Low-level ops: native (C++) components and Pallas TPU kernels."""
