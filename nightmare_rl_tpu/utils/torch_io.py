"""Checkpoint interop with the reference stack (rsl_rl torch format).

The reference saves/loads ``model_<iter>.pt`` torch files whose
``model_state_dict`` holds an rsl_rl v1.0.2 ActorCritic: MLP actor/critic
built as ``nn.Sequential(Linear, act, Linear, act, Linear, act, Linear)``
(keys ``actor.0.weight``, ``actor.2.weight``, ... — Linears at even
indices) plus the free ``std`` parameter; play.py:65-72 consumes exactly
that.  These helpers map our flax ActorCritic params
(``params['params']['actor']['Dense_k']['kernel'/'bias']``, torch weights
are the transposed kernels) to and from that format, so:

- a policy trained HERE can be exported and run by the reference's own
  play.py (tools/export_torch.py);
- a reference ``model_*.pt`` can be loaded into our runtime
  (tools/play.py --ckpt something.pt).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _mlp_to_torch(tree: Dict[str, Any], prefix: str, out: dict) -> None:
    ks = sorted(tree, key=lambda k: int(k.split("_")[1]))
    for i, k in enumerate(ks):
        out[f"{prefix}.{2 * i}.weight"] = np.asarray(tree[k]["kernel"]).T
        out[f"{prefix}.{2 * i}.bias"] = np.asarray(tree[k]["bias"])


def params_to_torch_state(params: Dict[str, Any]) -> dict:
    """Flax ActorCritic params -> rsl_rl ActorCritic state_dict (numpy
    values; callers torch.save after torch.from_numpy)."""
    p = params["params"]
    out: dict = {"std": np.asarray(p["std"])}
    _mlp_to_torch(p["actor"], "actor", out)
    _mlp_to_torch(p["critic"], "critic", out)
    return out


def torch_state_to_params(sd: dict, params_template: Dict[str, Any]):
    """rsl_rl state_dict -> flax params with the template's structure.
    Accepts torch tensors or numpy arrays as values."""
    import jax.numpy as jnp

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    tpl = params_template["params"]

    def fill_mlp(tree, prefix):
        new = {}
        ks = sorted(tree, key=lambda k: int(k.split("_")[1]))
        for i, k in enumerate(ks):
            w = arr(sd[f"{prefix}.{2 * i}.weight"])
            b = arr(sd[f"{prefix}.{2 * i}.bias"])
            assert w.T.shape == tree[k]["kernel"].shape, (
                f"{prefix} layer {i}: {w.T.shape} vs "
                f"{tree[k]['kernel'].shape} — hidden dims mismatch"
            )
            new[k] = {
                "kernel": jnp.asarray(w.T, tree[k]["kernel"].dtype),
                "bias": jnp.asarray(b, tree[k]["bias"].dtype),
            }
        return new

    return {"params": {
        "actor": fill_mlp(tpl["actor"], "actor"),
        "critic": fill_mlp(tpl["critic"], "critic"),
        "std": jnp.asarray(arr(sd["std"]), tpl["std"].dtype),
    }}


def save_pt(path: str, params: Dict[str, Any], iteration: int = 0) -> None:
    """Write a reference-compatible model_<iter>.pt (model_state_dict +
    iter; the reference's play.py reads only model_state_dict)."""
    import torch

    # copy=True: jax-backed numpy views are read-only, which torch rejects
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in params_to_torch_state(params).items()}
    torch.save({"model_state_dict": sd, "iter": iteration}, path)


def load_pt(path: str, params_template: Dict[str, Any]):
    """Read a reference model_*.pt into flax params."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    sd = blob.get("model_state_dict", blob)
    return torch_state_to_params(sd, params_template)
