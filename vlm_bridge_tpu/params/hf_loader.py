"""HuggingFace checkpoint -> JAX pytree converters.

Maps the on-disk parameter naming of `google/gemma-2-2b` (Gemma2ForCausalLM)
and `facebook/dinov2-large` (Dinov2Model) onto this framework's pytree layout.
Works from either an in-memory torch state dict (tests use tiny random HF
models) or a local safetensors directory (production, no torch needed).

Torch nn.Linear stores weights [out, in]; JAX convention here is [in, out],
so every dense weight is transposed once at conversion time.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Callable, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from vlm_bridge_tpu.configs import DinoV2Config, Gemma2Config


def _np(x) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (f32 for safety)."""
    if hasattr(x, "detach"):
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x)


def _as(dtype, x) -> jnp.ndarray:
    return jnp.asarray(_np(x), dtype=dtype)


# ---------------------------------------------------------------------------
# Gemma-2
# ---------------------------------------------------------------------------


def gemma2_from_state_dict(
    sd: Mapping[str, object], cfg: Gemma2Config, dtype=jnp.bfloat16
) -> dict:
    """Convert a Gemma2ForCausalLM (or Gemma2Model) state dict."""
    p = "model." if any(k.startswith("model.") for k in sd) else ""

    def g(name):
        return sd[p + name]

    layers = {}
    for i in range(cfg.num_layers):
        lp = f"layers.{i}."
        layers[str(i)] = {
            "input_norm": _as(dtype, g(lp + "input_layernorm.weight")),
            "post_attn_norm": _as(dtype, g(lp + "post_attention_layernorm.weight")),
            "pre_ffn_norm": _as(dtype, g(lp + "pre_feedforward_layernorm.weight")),
            "post_ffn_norm": _as(dtype, g(lp + "post_feedforward_layernorm.weight")),
            "attn": {
                "q": _as(dtype, _np(g(lp + "self_attn.q_proj.weight")).T),
                "k": _as(dtype, _np(g(lp + "self_attn.k_proj.weight")).T),
                "v": _as(dtype, _np(g(lp + "self_attn.v_proj.weight")).T),
                "o": _as(dtype, _np(g(lp + "self_attn.o_proj.weight")).T),
            },
            "mlp": {
                "gate": _as(dtype, _np(g(lp + "mlp.gate_proj.weight")).T),
                "up": _as(dtype, _np(g(lp + "mlp.up_proj.weight")).T),
                "down": _as(dtype, _np(g(lp + "mlp.down_proj.weight")).T),
            },
        }
    return {
        "embedding": _as(dtype, g("embed_tokens.weight")),
        "final_norm": _as(dtype, g("norm.weight")),
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# DINOv2
# ---------------------------------------------------------------------------


def dinov2_from_state_dict(
    sd: Mapping[str, object], cfg: DinoV2Config, dtype=jnp.bfloat16,
    *, target_grids: tuple = (16,),
) -> dict:
    """Convert a Dinov2Model state dict.

    target_grids: patch grids (e.g. 16 for 224px) for which torch-exact
    bicubic pos-embed interpolation tables are precomputed (torch bicubic
    A=-0.75 differs from jax.image A=-0.5 — see models/dinov2.py).
    """
    def ln(name):
        return {
            "scale": _as(dtype, sd[name + ".weight"]),
            "bias": _as(dtype, sd[name + ".bias"]),
        }

    layers = {}
    for i in range(cfg.num_layers):
        lp = f"encoder.layer.{i}."
        if cfg.use_swiglu_ffn:  # dinov2-giant (HF Dinov2SwiGLUFFN keys)
            mlp = {
                "win": _as(dtype, _np(sd[lp + "mlp.weights_in.weight"]).T),
                "win_bias": _as(dtype, sd[lp + "mlp.weights_in.bias"]),
                "wout": _as(dtype, _np(sd[lp + "mlp.weights_out.weight"]).T),
                "wout_bias": _as(dtype, sd[lp + "mlp.weights_out.bias"]),
            }
        else:
            mlp = {
                "fc1": _as(dtype, _np(sd[lp + "mlp.fc1.weight"]).T),
                "fc1_bias": _as(dtype, sd[lp + "mlp.fc1.bias"]),
                "fc2": _as(dtype, _np(sd[lp + "mlp.fc2.weight"]).T),
                "fc2_bias": _as(dtype, sd[lp + "mlp.fc2.bias"]),
            }
        layers[str(i)] = {
            "norm1": ln(lp + "norm1"),
            "norm2": ln(lp + "norm2"),
            "attn": {
                # Fused [q|k|v] along the output dim (see dinov2.init).
                "qkv": _as(dtype, np.concatenate([
                    _np(sd[lp + "attention.attention.query.weight"]).T,
                    _np(sd[lp + "attention.attention.key.weight"]).T,
                    _np(sd[lp + "attention.attention.value.weight"]).T,
                ], axis=1)),
                "qkv_bias": _as(dtype, np.concatenate([
                    _np(sd[lp + "attention.attention.query.bias"]),
                    _np(sd[lp + "attention.attention.key.bias"]),
                    _np(sd[lp + "attention.attention.value.bias"]),
                ], axis=0)),
                "o": _as(dtype, _np(sd[lp + "attention.output.dense.weight"]).T),
                "o_bias": _as(dtype, sd[lp + "attention.output.dense.bias"]),
            },
            "mlp": mlp,
            "layerscale1": _as(dtype, sd[lp + "layer_scale1.lambda1"]),
            "layerscale2": _as(dtype, sd[lp + "layer_scale2.lambda1"]),
        }

    pos_embed_np = _np(sd["embeddings.position_embeddings"])
    params = {
        "patch_embed": {
            # torch conv OIHW [h, C, ph, pw] -> HWIO [ph, pw, C, h]
            "kernel": _as(dtype, _np(
                sd["embeddings.patch_embeddings.projection.weight"]
            ).transpose(2, 3, 1, 0)),
            "bias": _as(dtype, sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "cls_token": _as(dtype, sd["embeddings.cls_token"]),
        "pos_embed": _as(dtype, pos_embed_np),
        "final_norm": ln("layernorm"),
        "layers": layers,
    }

    native = cfg.native_grid
    for grid in target_grids:
        if grid == native:
            continue
        params[f"pos_embed_interp_{grid}"] = _as(
            dtype, _torch_bicubic_pos_interp(pos_embed_np, grid))
    return params


def _torch_bicubic_pos_interp(pos_embed: np.ndarray, grid: int) -> np.ndarray:
    """Torch-exact bicubic interpolation of [1, 1+N, h] pos embeddings.

    Matches HF Dinov2Embeddings.interpolate_pos_encoding (f32 bicubic,
    align_corners=False). Uses torch at conversion time only.
    """
    import torch

    n_pos = pos_embed.shape[1] - 1
    native = int(round(n_pos ** 0.5))
    h = pos_embed.shape[-1]
    cls_pos = pos_embed[:, :1]
    patch = torch.from_numpy(
        pos_embed[:, 1:].astype(np.float32)
    ).reshape(1, native, native, h).permute(0, 3, 1, 2)
    patch = torch.nn.functional.interpolate(
        patch, size=(grid, grid), mode="bicubic", align_corners=False)
    patch = patch.permute(0, 2, 3, 1).reshape(1, grid * grid, h).numpy()
    return np.concatenate([cls_pos, patch], axis=1)


# ---------------------------------------------------------------------------
# Safetensors directory loading (production path, no torch required)
# ---------------------------------------------------------------------------


def load_safetensors_dir(path: str | Path) -> Dict[str, np.ndarray]:
    """Load all *.safetensors in a local HF snapshot directory into one dict.

    Uses the torch framework reader because production Gemma-2 checkpoints are
    bf16, which numpy cannot represent; tensors are upcast to f32 numpy here
    and recast to the target dtype in the converters.
    """
    from safetensors import safe_open  # ships with transformers' deps

    path = Path(path)
    sd: Dict[str, np.ndarray] = {}
    files = sorted(path.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for f in files:
        with safe_open(str(f), framework="pt") as st:
            for k in st.keys():
                sd[k] = _np(st.get_tensor(k))
    return sd


def load_gemma2(path: str | Path, cfg: Gemma2Config, dtype=jnp.bfloat16) -> dict:
    return gemma2_from_state_dict(load_safetensors_dir(path), cfg, dtype)


def load_dinov2(path: str | Path, cfg: DinoV2Config, dtype=jnp.bfloat16,
                target_grids: tuple = (16,)) -> dict:
    return dinov2_from_state_dict(
        load_safetensors_dir(path), cfg, dtype, target_grids=target_grids)
