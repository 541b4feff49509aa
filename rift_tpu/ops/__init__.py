"""TPU kernels (Pallas) and XLA-composite ops for the hot paths."""
