"""reef_tpu — a TPU-native zero-knowledge regex-proof framework.

A from-scratch rebuild of the capabilities of eniac/Reef (succinct ZK proofs
that a committed document matches / does not match a regex, per eprint
2023/1886), re-architected for TPU:

  - all 255-bit Pasta-field arithmetic runs as multi-limb integer kernels in
    JAX/XLA (with Pallas kernels for the hot paths), batched and sharded over
    a `jax.sharding.Mesh`;
  - the regex -> SAFA frontend is host Python (the reference's is host Rust,
    src/frontend/*);
  - the constraint compiler emits sparse R1CS directly from a small gadget
    library (replacing the reference's CirC IR pipeline, src/backend/r1cs.rs);
  - Nova-style folding, Spartan compression, and Hyrax/IPA/Pedersen document
    commitments are implemented over the same batched field kernels
    (reference: forked nova-snark crates, src/backend/{framework,nova,
    commitment}.rs).

Layer map (mirrors SURVEY.md section 1):
  L5 cli.py            -- commit/prove/verify/e2e parties, alphabets
  L4 frontend/         -- regex AST + derivatives, OpenSet, SAFA, solver
  L3 backend/{table,r1cs,costs}.py -- lookup table, constraint compiler
  L2 backend/{framework,nova,commitment,merkle}.py -- proof-system glue
  L1 ops/ + ec/        -- field/Poseidon/sumcheck/MSM kernels (the TPU layer)
"""

__version__ = "0.1.0"
