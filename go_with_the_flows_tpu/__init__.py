"""go_with_the_flows_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
mixtures of conditional normalizing flows over point clouds.

Re-implements, TPU-first, the full capability surface of the reference
"Go with the Flows" codebase (mixture-of-RealNVP point-cloud VAE: generation,
autoencoding, single-view reconstruction, and the CD/EMD/F1/JSD/MMD/COV/1-NNA
evaluation suite), with:

  * functional flow stacks under `jit` (accumulated log-dets, no Python-side
    per-sample loops),
  * the K mixture components evaluated as a single `vmap` over stacked
    parameters (one fused computation instead of K module calls),
  * data parallelism via a `jax.sharding.Mesh` (gradient all-reduce and
    synchronized BatchNorm statistics fall out of XLA SPMD on the global
    batch — no explicit collectives in user code),
  * Pallas TPU kernels for the Chamfer / EMD metric hot paths.

Reference behavior citations in docstrings point into the upstream repo
(file:line) for parity checking; no code is copied from it.
"""

__version__ = "0.1.0"
