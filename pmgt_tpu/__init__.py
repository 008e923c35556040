"""PMGT-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for pre-training
graph transformers with multimodal side information, plus downstream
recommendation models (NCF family, DCN).

Re-designed from scratch for TPU hardware with the capability surface of the
reference PyTorch implementation (uoo723/PMGT; see SURVEY.md):

- PMGT pre-training with Graph Structure Reconstruction (GSR) and Node
  Feature Reconstruction (NFR) losses over contextual neighborhoods sampled
  on-device (vs. the reference's host-side networkx sampler,
  reference pmgt/pmgt/datasets.py:14-53).
- NCF (GMF / MLP / NeuMF-end / NeuMF-pre) and DCN downstream models with
  optional PMGT-pretrained item embedding injection.
- A trainer engine with early stopping, best/last checkpointing (Orbax), a
  filesystem run registry (replacing the reference's MLflow store), metric
  logging, and an HPO driver with the reference's conditional search-space
  DSL (reference hp_tuning.py:30-77).

Design principles (TPU-first):
- Everything on the hot path is a jitted pure function of (params, batch,
  key); graph sampling is vectorized `jax.random.categorical` over a padded
  CSR graph, not Python loops.
- Data parallelism via `jax.sharding.Mesh` + NamedSharding; XLA emits the
  gradient all-reduce over ICI.
- bf16 compute policy optional; fp32 params.
- The dual-attention core is swappable between a reference XLA
  implementation and a fused Pallas kernel.
"""

__version__ = "0.1.0"

from pmgt_tpu.core.config import PMGTConfig  # noqa: F401
