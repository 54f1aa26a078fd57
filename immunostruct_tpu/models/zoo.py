"""The 14-model registry (reference: immunostruct/models/mapping.py:6-21).

Each entry is a ``ModelSpec`` realizing the corresponding reference class as
a configuration of the shared trunk:

  SequenceModel                  ablation_models.py:10-66    VAE only
  SequenceFpModel                ablation_models.py:68-125   VAE + raw 2 props
  StructureModel                 ablation_models.py:127-180  EGNN + MHA(8)
  StructureModel_SSL             ablation_models.py:182-242
  StructureModelv2               ablation_models.py:244-307  mean+max pool
  HybridModel                    hybrid_models.py:10-119     self-attn fusion
  HybridModel_SSL                hybrid_models.py:121-238
  HybridModelv2                  hybrid_models.py:240-359    +fusion MHA(16,8)
  HybridModelv2_SSL              hybrid_models.py:361-488    +fusion MHA(32,8)
  HybridModel_Comparative        comparative_models.py:11-173
  HybridModel_Comparative_SSL    comparative_models.py:175-350
  HybridModelv2_Comparative      comparative_models.py:353-527 +fusion MHA(32,8)
  HybridModelv2_Comparative_SSL  comparative_models.py:529-713
  DualModel                      ablation_models.py:309-398  structure+seq, no prop
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from immunostruct_tpu.models.trunk import ModelSpec, model_init

model_map: dict[str, ModelSpec] = {
    "SequenceModel": ModelSpec(
        name="SequenceModel", use_structure=False, use_property=False),
    "SequenceFpModel": ModelSpec(
        name="SequenceFpModel", use_structure=False, use_property=False,
        raw_property_concat=True),
    "StructureModel": ModelSpec(
        name="StructureModel", use_sequence=False, use_property=False,
        node_attention="mha", self_attention_heads=8),
    "StructureModel_SSL": ModelSpec(
        name="StructureModel_SSL", use_sequence=False, use_property=False,
        node_attention="mha", self_attention_heads=8, ssl=True),
    "StructureModelv2": ModelSpec(
        name="StructureModelv2", use_sequence=False, use_property=False,
        node_attention="mha", self_attention_heads=8, ssl=True,
        mean_max_pool=True),
    "HybridModel": ModelSpec(
        name="HybridModel", node_attention="self"),
    "HybridModel_SSL": ModelSpec(
        name="HybridModel_SSL", node_attention="self", ssl=True),
    "HybridModelv2": ModelSpec(
        name="HybridModelv2", node_attention="mha", self_attention_heads=1,
        combined_attention_dim=16, combined_attention_heads=8),
    "HybridModelv2_SSL": ModelSpec(
        name="HybridModelv2_SSL", node_attention="mha", self_attention_heads=1,
        combined_attention_dim=32, combined_attention_heads=8, ssl=True),
    "HybridModel_Comparative": ModelSpec(
        name="HybridModel_Comparative", node_attention="self", comparative=True),
    "HybridModel_Comparative_SSL": ModelSpec(
        name="HybridModel_Comparative_SSL", node_attention="self",
        comparative=True, ssl=True),
    "HybridModelv2_Comparative": ModelSpec(
        name="HybridModelv2_Comparative", node_attention="mha",
        self_attention_heads=1, combined_attention_dim=32,
        combined_attention_heads=8, comparative=True),
    "HybridModelv2_Comparative_SSL": ModelSpec(
        name="HybridModelv2_Comparative_SSL", node_attention="mha",
        self_attention_heads=1, combined_attention_dim=32,
        combined_attention_heads=8, comparative=True, ssl=True),
    "DualModel": ModelSpec(
        name="DualModel", node_attention="self", use_property=False),
}


def build_model(name: str, vae_input_dim: int, key: jax.Array,
                use_wt_for_downstream: bool = True,
                dtype=jnp.float32, **overrides):
    """Build (spec, params) for a registry name.

    ``use_wt_for_downstream`` only affects comparative models
    (train_Cancer_wFT.py:73 passes it through for all models; the plain
    models accept-and-ignore it via **kwargs, mirrored here).
    """
    if name not in model_map:
        raise KeyError(f"unknown model '{name}'; choose from {sorted(model_map)}")
    spec = model_map[name]
    if spec.comparative:
        overrides = {"use_wt_for_downstream": use_wt_for_downstream, **overrides}
    if overrides:
        spec = dataclasses.replace(spec, **overrides)
    params = model_init(key, spec, vae_input_dim, dtype=dtype)
    return spec, params
