"""Multi-chip sharding: mesh construction + sharded prover kernels."""
