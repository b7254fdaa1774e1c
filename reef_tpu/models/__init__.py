"""Flagship device pipelines (the prover's hot compute paths)."""
