"""decagon_tpu: a TPU-native multi-relational GNN framework.

A from-scratch JAX/XLA/Pallas framework covering the Decagon polypharmacy
model family (reference capability survey: SURVEY.md): multi-relational
graph convolution encoders over typed-node graphs, tensor-factorization
decoders (innerproduct / distmult / bilinear / dedicom), negative-sampled
hinge / cross-entropy link prediction, per-relation minibatch scheduling,
AUROC/AUPRC/AP@k evaluation, checkpointing with embedding export, an
offline predictor, and masking-based active-learning curricula.

Design is TPU-first, not a port:
  * static shapes everywhere (padded, flattened relation edge stacks);
  * project-then-aggregate encoders (stacked-weight einsum on the MXU,
    one flat gather+segment-sum per edge type for the SpMM);
  * sampled SDDMM edge scoring instead of dense ``Z R Z^T`` reconstruction;
  * sharding via ``jax.sharding.Mesh`` + ``shard_map`` with psum-based
    edge-partitioned aggregation.
"""

__version__ = "0.1.0"

from decagon_tpu.graph.container import Relation, RelationGraph  # noqa: F401
from decagon_tpu.graph.device import DeviceGraph  # noqa: F401
