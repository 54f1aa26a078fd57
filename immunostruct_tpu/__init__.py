"""ImmunoStruct-TPU: a TPU-native JAX framework for multimodal pMHC immunogenicity.

A ground-up re-design of the capabilities of KrishnaswamyLab/ImmunoStruct
(reference mounted at /root/reference) for TPU hardware:

- fixed-shape padded ``GraphBatch`` pytrees instead of DGL/PyG ragged graphs
  (the reference already pads every graph to the corpus max node count,
  reference: immunostruct/data/preprocess.py:343-349, so dense fixed shapes
  are the natural TPU formulation);
- E(n)-equivariant GNN message passing as masked gather/segment-sum over
  padded edge lists (MXU-friendly one-hot-matmul aggregation) instead of
  DGL's CUDA gSpMM kernels;
- one jitted train step fusing GNN + attention + VAE + fusion + loss + grad
  + optimizer update;
- data parallelism via ``jax.sharding`` over a named device mesh (psum over
  ICI) instead of single-GPU execution.

Package layout:
  ops/         masked EGNN, attention, pooling primitives (+ Pallas kernels)
  models/      the 14-model registry as parameterized variants of one trunk
  data/        table parsing, HLA expansion, one-hot encoding, graph batching
  procedures/  train/eval/inference engines, metrics, clinical validation
  utils/       losses, contrastive loss, schedules, checkpointing
  parallel/    mesh setup, collectives, sharded training
  featurize/   offline PDB -> fixed-shape graph featurizer (graphein replacement)
  serving.py   batch serving of exported StableHLO artifacts (queue + HTTP)
  cli/         entry points mirroring the reference scripts (+ TPU extras)
"""

__version__ = "0.1.0"

from immunostruct_tpu.config import Config, update_paths
from immunostruct_tpu.structs import GraphBatch, SampleBatch, ComparativeBatch
