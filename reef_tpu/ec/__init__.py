"""Pasta curve arithmetic: host oracle + batched TPU point kernels + MSM."""
