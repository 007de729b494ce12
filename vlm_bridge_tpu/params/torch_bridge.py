"""Reference `.pth` bridge checkpoint <-> JAX pytree conversion.

The reference writes TWO incompatible formats (a known bug, SURVEY.md §2 n.1):

1. Trainer checkpoints (training_orchestrator.py:114-125):
   {"model_state_dict": {"bridge_module.bridge_blocks.{b}....": tensor}}
   (also carries optimizer/scheduler/epoch state)
2. FullModel.save_model (full_model.py:450-461):
   {"bridge_module_state_dict": {"bridge_blocks.{b}....": tensor}}

This converter accepts BOTH (and a bare state dict), normalizing key prefixes.
The reverse direction emits format 2 (the documented weights-only layout).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from vlm_bridge_tpu.configs import BridgeConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x)


def extract_bridge_state_dict(ckpt: Mapping) -> Dict[str, np.ndarray]:
    """Normalize any reference checkpoint layout to flat
    {"bridge_blocks.{b}....": ndarray} keys."""
    if "bridge_module_state_dict" in ckpt:
        sd = ckpt["bridge_module_state_dict"]
    elif "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
    else:
        sd = ckpt
    out = {}
    for k, v in sd.items():
        if "bridge_blocks" not in k:
            continue
        k = k[k.index("bridge_blocks"):]
        out[k] = _np(v)
    if not out:
        raise ValueError("no bridge_blocks.* keys found in checkpoint")
    return out


def bridge_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: BridgeConfig, dtype=jnp.float32
) -> dict:
    """Reference state dict -> this framework's bridge pytree."""
    def a(name, transpose=False):
        x = _np(sd[name])
        if transpose:
            x = x.T
        return jnp.asarray(x, dtype=dtype)

    blocks = {}
    for b in range(cfg.num_blocks):
        p = f"bridge_blocks.{b}."

        def attn(prefix):
            return {
                "q": a(prefix + "w_q.weight", True), "q_bias": a(prefix + "w_q.bias"),
                "k": a(prefix + "w_k.weight", True), "k_bias": a(prefix + "w_k.bias"),
                "v": a(prefix + "w_v.weight", True), "v_bias": a(prefix + "w_v.bias"),
                "o": a(prefix + "w_o.weight", True), "o_bias": a(prefix + "w_o.bias"),
            }

        def ln(name):
            return {"scale": a(name + ".weight"), "bias": a(name + ".bias")}

        blocks[str(b)] = {
            "cross": attn(p + "cross_attention."),
            "ln_cross": ln(p + "ln_cross"),
            "self": attn(p + "self_attention."),
            "ln_self": ln(p + "ln_self"),
            # reference FFN is nn.Sequential(Linear, GELU, Dropout, Linear, Dropout)
            "ffn": {
                "fc1": a(p + "ffn.0.weight", True), "fc1_bias": a(p + "ffn.0.bias"),
                "fc2": a(p + "ffn.3.weight", True), "fc2_bias": a(p + "ffn.3.bias"),
            },
            "ln_ffn": ln(p + "ln_ffn"),
        }
    return {"blocks": blocks}


def bridge_to_state_dict(params: dict, cfg: BridgeConfig) -> Dict[str, np.ndarray]:
    """This framework's bridge pytree -> reference-layout flat state dict."""
    out: Dict[str, np.ndarray] = {}
    for b in range(cfg.num_blocks):
        bp = params["blocks"][str(b)]
        p = f"bridge_blocks.{b}."

        def put_attn(prefix, tree):
            for name, key in (("w_q", "q"), ("w_k", "k"), ("w_v", "v"), ("w_o", "o")):
                out[prefix + name + ".weight"] = np.asarray(
                    tree[key], np.float32).T.copy()
                out[prefix + name + ".bias"] = np.asarray(
                    tree[key + "_bias"], np.float32)

        def put_ln(name, tree):
            out[name + ".weight"] = np.asarray(tree["scale"], np.float32)
            out[name + ".bias"] = np.asarray(tree["bias"], np.float32)

        put_attn(p + "cross_attention.", bp["cross"])
        put_ln(p + "ln_cross", bp["ln_cross"])
        put_attn(p + "self_attention.", bp["self"])
        put_ln(p + "ln_self", bp["ln_self"])
        out[p + "ffn.0.weight"] = np.asarray(bp["ffn"]["fc1"], np.float32).T.copy()
        out[p + "ffn.0.bias"] = np.asarray(bp["ffn"]["fc1_bias"], np.float32)
        out[p + "ffn.3.weight"] = np.asarray(bp["ffn"]["fc2"], np.float32).T.copy()
        out[p + "ffn.3.bias"] = np.asarray(bp["ffn"]["fc2_bias"], np.float32)
        put_ln(p + "ln_ffn", bp["ln_ffn"])
    return out


def load_pth(path: str | Path, cfg: BridgeConfig, dtype=jnp.float32) -> dict:
    """Load a reference .pth checkpoint (any of the three layouts)."""
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    return bridge_from_state_dict(extract_bridge_state_dict(ckpt), cfg, dtype)


def save_pth(params: dict, cfg: BridgeConfig, path: str | Path) -> None:
    """Save in reference FullModel.save_model format (weights-only)."""
    import torch

    sd = {k: torch.from_numpy(np.array(v))  # copy: jnp buffers are read-only
          for k, v in bridge_to_state_dict(params, cfg).items()}
    torch.save({"bridge_module_state_dict": sd,
                "model_config": {"bridge_dropout": cfg.dropout}}, str(path))
