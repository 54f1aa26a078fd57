"""Import reference PyTorch checkpoints into immunostruct-tpu param pytrees.

Lets users of the reference bring their trained ``state_dict()`` files
(saved by procedures/train.py:48-55) into this framework. The key layout is
derived from the reference model definitions:

  vae_fc1/fc21/fc22/fc3/fc4            hybrid_models.py:37-41
  property_embedding.{0,3}             hybrid_models.py:46-52 (Sequential)
  classifier.{1,4} (plain)             hybrid_models.py:54-61 (Flatten at 0)
  classifier.1 + classifier_head +
  node_predictor_head (SSL)            hybrid_models.py:157-160
  self_attention.{query,key,value}     layers.py:6-11 (SelfAttention)
  self_attention.w_{q,k,v,concat}      layers.py:51-64 (MultiHeadAttention)
  combined_attention.w_*               hybrid_models.py:275 (v2)
  GCN_layers.{i}.{edge,node,coord}_mlp.{0,2}   DGL EGNNConv submodules

torch Linear stores weight [out, in]; our layout is w [in, out], so weights
transpose on the way in. Accepts either a torch state_dict (tensors) or any
mapping of numpy arrays with the same keys, so torch is not required.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from immunostruct_tpu.models.trunk import ModelSpec


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    out = {"w": _to_np(sd[f"{prefix}.weight"]).T}
    if bias:
        out["b"] = _to_np(sd[f"{prefix}.bias"])
    return out


def _mha(sd: Mapping, prefix: str) -> dict:
    return {
        "w_q": _linear(sd, f"{prefix}.w_q"),
        "w_k": _linear(sd, f"{prefix}.w_k"),
        "w_v": _linear(sd, f"{prefix}.w_v"),
        "w_concat": _linear(sd, f"{prefix}.w_concat"),
    }


def import_torch_state_dict(sd: Mapping, spec: ModelSpec) -> dict:
    """Reference state_dict -> param pytree matching ``model_init(spec)``."""
    params: dict = {}

    if spec.use_structure:
        gcn = []
        i = 0
        while f"GCN_layers.{i}.edge_mlp.0.weight" in sd:
            p = f"GCN_layers.{i}"
            gcn.append({
                "edge_mlp": [_linear(sd, f"{p}.edge_mlp.0"),
                             _linear(sd, f"{p}.edge_mlp.2")],
                "node_mlp": [_linear(sd, f"{p}.node_mlp.0"),
                             _linear(sd, f"{p}.node_mlp.2")],
                "coord_mlp": [_linear(sd, f"{p}.coord_mlp.0"),
                              _linear(sd, f"{p}.coord_mlp.2", bias=False)],
            })
            i += 1
        if not gcn:
            raise KeyError("no GCN_layers.* keys found in state_dict")
        params["gcn"] = gcn

        if spec.node_attention == "self":
            params["node_attn"] = {
                "query": _linear(sd, "self_attention.query"),
                "key": _linear(sd, "self_attention.key"),
                "value": _linear(sd, "self_attention.value"),
            }
        else:
            params["node_attn"] = _mha(sd, "self_attention")

    if spec.use_sequence:
        params["vae"] = {
            "fc1": _linear(sd, "vae_fc1"),
            "fc21": _linear(sd, "vae_fc21"),
            "fc22": _linear(sd, "vae_fc22"),
            "fc3": _linear(sd, "vae_fc3"),
            "fc4": _linear(sd, "vae_fc4"),
        }

    if spec.use_property and spec.use_sequence:
        params["property_embedding"] = [
            _linear(sd, "property_embedding.0"),
            _linear(sd, "property_embedding.3"),
        ]

    if spec.combined_attention_dim > 0:
        params["combined_attention"] = _mha(sd, "combined_attention")

    classifier = {"trunk": _linear(sd, "classifier.1")}
    if spec.ssl:
        classifier["classifier_head"] = _linear(sd, "classifier_head")
        classifier["node_predictor_head"] = _linear(sd, "node_predictor_head")
    else:
        classifier["out"] = _linear(sd, "classifier.4")
    params["classifier"] = classifier
    return params


def import_torch_checkpoint(path: str, spec: ModelSpec) -> dict:
    """Load a reference ``.pt`` checkpoint file (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return import_torch_state_dict(sd, spec)


def is_torch_checkpoint(path: str) -> bool:
    """Sniff whether ``path`` is a torch ``state_dict`` file (vs this
    framework's npz checkpoints).

    Both formats are zipfiles, so the extension alone is unreliable:
    torch's zip serialization carries a ``data.pkl`` member while npz
    members are ``*.npy``; legacy torch checkpoints are bare pickles
    (``\\x80`` protocol byte).
    """
    import zipfile

    try:
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
        # torch zip serialization carries data.pkl; anything else
        # (npz = all-*.npy members, or unknown zips) is treated as native
        return any(n.endswith("data.pkl") for n in names)
    except zipfile.BadZipFile:
        with open(path, "rb") as f:
            return f.read(1) == b"\x80"  # pickle protocol marker


def require_exact_reference_padding(config) -> None:
    """Force exact-corpus-max padding for reference-checkpoint evaluation.

    The reference pads graphs to the exact corpus max node count
    (reference: immunostruct/data/preprocess.py:343-349) and its
    ``global_mean_pool`` divides by that padded count while the node
    attention softmax spans all padded rows
    (hybrid_models.py:97, :326-327). Evaluating an imported checkpoint at a
    different padded N (e.g. 283 rounded up to 288 by
    ``pad_nodes_multiple=8``) therefore does NOT reproduce the reference's
    logits. This mutates ``config`` to pad to the exact corpus max; callers
    must do so BEFORE building the dataset.
    """
    if config.pad_nodes_multiple != 1:
        print(f"reference checkpoint: overriding pad_nodes_multiple="
              f"{config.pad_nodes_multiple} -> 1 (exact corpus max) so "
              "mean-pool/attention numerics match the reference geometry")
        config.pad_nodes_multiple = 1


def load_any_checkpoint(path: str, like: dict, spec: ModelSpec,
                        verbose: bool = True) -> dict:
    """Load either a native npz checkpoint or a reference torch state_dict,
    sniffed by content (see ``is_torch_checkpoint``)."""
    if is_torch_checkpoint(path):
        if verbose:
            print(f"loading reference torch state_dict: {path}")
        return import_torch_checkpoint(path, spec)
    from immunostruct_tpu.utils.checkpoint import load_checkpoint

    return load_checkpoint(path, like, verbose=verbose)
