"""TPU compute kernels: multi-limb field arithmetic, Poseidon, sumcheck, MSM."""
