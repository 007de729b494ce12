"""Full-stack numerics parity: JAX Encoder-Adapter-Decoder vs a torch
assembly of the reference architecture (tiny configs, f32, no network).

The torch side reproduces the reference semantics from spec
(reference: src/vlm_bridge/model_architecture/full_model.py:95-189,
bridge_module.py:24-335, core_training_loop.py:52-70):

  vision = Dinov2Model(pixels).last_hidden_state
  embeds = gemma.embed_tokens(input_ids)            # raw, pre-normalizer
  bridged = BridgeLite(embeds, vision)              # NO pad mask anywhere
  logits = Gemma2ForCausalLM(inputs_embeds=bridged, attention_mask).logits
  labels = left-shifted input_ids, last = -100
  loss = CrossEntropyLoss(ignore_index=-100)        # pads included (ref bug)

and must match `full_model.forward(..., mask_pad_loss=False,
bridge_pad_mask=False)` — the reference-parity flags — to f32 tolerance.
This is the SURVEY.md §7 stage-6 loss-parity check.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import VLMConfig
from vlm_bridge_tpu.models import full_model
from vlm_bridge_tpu.params.hf_loader import (
    dinov2_from_state_dict, gemma2_from_state_dict)
from vlm_bridge_tpu.params.torch_bridge import bridge_to_state_dict

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# ---------------------------------------------------------------------------
# Torch replica of the reference bridge (built from spec, weight-compatible
# with params/torch_bridge.py state-dict layout)
# ---------------------------------------------------------------------------


class _Attn(nn.Module):
    def __init__(self, q_dim, kv_dim, d_model, heads):
        super().__init__()
        self.heads = heads
        self.w_q = nn.Linear(q_dim, d_model)
        self.w_k = nn.Linear(kv_dim, d_model)
        self.w_v = nn.Linear(kv_dim, d_model)
        self.w_o = nn.Linear(d_model, d_model)

    def forward(self, q_in, kv_in):
        B, T, _ = q_in.shape
        S = kv_in.shape[1]
        H = self.heads
        q = self.w_q(q_in).view(B, T, H, -1).transpose(1, 2)
        k = self.w_k(kv_in).view(B, S, H, -1).transpose(1, 2)
        v = self.w_v(kv_in).view(B, S, H, -1).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        return self.w_o(o.transpose(1, 2).reshape(B, T, -1))


class _Block(nn.Module):
    def __init__(self, vision_dim, d_model, heads_cross, heads_self, ffn_mult):
        super().__init__()
        self.ln_cross = nn.LayerNorm(d_model)
        self.cross_attention = _Attn(d_model, vision_dim, d_model, heads_cross)
        self.ln_self = nn.LayerNorm(d_model)
        self.self_attention = _Attn(d_model, d_model, d_model, heads_self)
        self.ln_ffn = nn.LayerNorm(d_model)
        self.ffn = nn.Sequential(
            nn.Linear(d_model, ffn_mult * d_model), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(ffn_mult * d_model, d_model), nn.Dropout(0.0))

    def forward(self, text, vision):
        text = text + self.cross_attention(self.ln_cross(text), vision)
        h = self.ln_self(text)
        text = text + self.self_attention(h, h)
        return text + self.ffn(self.ln_ffn(text))


class _Bridge(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.bridge_blocks = nn.ModuleList([
            _Block(cfg.vision_dim, cfg.language_dim, cfg.num_heads_cross,
                   cfg.num_heads_self, cfg.ffn_mult)
            for _ in range(cfg.num_blocks)])

    def forward(self, text, vision):
        for blk in self.bridge_blocks:
            text = blk(text, vision)
        return text


@pytest.fixture(scope="module")
def stacks():
    from transformers import Dinov2Config as HFDino
    from transformers import Gemma2Config as HFGemma
    from transformers.models.dinov2.modeling_dinov2 import Dinov2Model
    from transformers.models.gemma2.modeling_gemma2 import Gemma2ForCausalLM

    cfg = VLMConfig.tiny_test()
    torch.manual_seed(0)
    vis = Dinov2Model(HFDino(
        hidden_size=cfg.vision.hidden_size,
        num_hidden_layers=cfg.vision.num_layers,
        num_attention_heads=cfg.vision.num_heads,
        mlp_ratio=cfg.vision.mlp_ratio,
        image_size=cfg.vision.image_size,
        patch_size=cfg.vision.patch_size,
        layerscale_value=cfg.vision.layerscale_value,
        attn_implementation="eager")).eval()
    lm = Gemma2ForCausalLM(HFGemma(
        vocab_size=cfg.lm.vocab_size,
        hidden_size=cfg.lm.hidden_size,
        intermediate_size=cfg.lm.intermediate_size,
        num_hidden_layers=cfg.lm.num_layers,
        num_attention_heads=cfg.lm.num_heads,
        num_key_value_heads=cfg.lm.num_kv_heads,
        head_dim=cfg.lm.head_dim,
        query_pre_attn_scalar=cfg.lm.query_pre_attn_scalar,
        sliding_window=cfg.lm.sliding_window,
        max_position_embeddings=cfg.lm.max_position_embeddings,
        attn_implementation="eager")).eval()

    params = full_model.init(jax.random.key(0), cfg, frozen_dtype=jnp.float32)
    params["vision"] = dinov2_from_state_dict(
        vis.state_dict(), cfg.vision, dtype=jnp.float32,
        target_grids=(cfg.image_size // cfg.vision.patch_size,))
    params["lm"] = gemma2_from_state_dict(
        lm.state_dict(), cfg.lm, dtype=jnp.float32)

    bridge = _Bridge(cfg.bridge).eval()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in bridge_to_state_dict(params["bridge"], cfg.bridge).items()}
    bridge.load_state_dict(sd, strict=True)
    return cfg, params, vis, lm, bridge


def _torch_full(cfg, vis, lm, bridge, pixels_nhwc, ids, mask):
    with torch.no_grad():
        px = torch.from_numpy(pixels_nhwc.transpose(0, 3, 1, 2)).float()
        vision = vis(px).last_hidden_state
        embeds = lm.get_input_embeddings()(torch.from_numpy(ids))
        bridged = bridge(embeds, vision)
        out = lm(inputs_embeds=bridged,
                 attention_mask=torch.from_numpy(mask))
        return out.logits.numpy()


def test_full_stack_logits_and_loss_parity(stacks):
    cfg, params, vis, lm, bridge = stacks
    B, T = 2, 10
    rng = np.random.default_rng(0)
    pixels = rng.normal(0, 1, (B, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32)
    ids = rng.integers(3, cfg.lm.vocab_size, (B, T)).astype(np.int64)
    mask = np.ones((B, T), np.int64)
    mask[1, 7:] = 0
    ids[1, 7:] = cfg.lm.pad_token_id

    ref_logits = _torch_full(cfg, vis, lm, bridge, pixels, ids, mask)

    mine = full_model.forward(
        params, cfg, jnp.asarray(pixels), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), bridge_pad_mask=False, remat_lm=False)
    mine = np.asarray(mine)
    # non-pad positions must match tightly (pad queries are garbage both sides)
    np.testing.assert_allclose(mine[0], ref_logits[0], atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(
        mine[1, :7], ref_logits[1, :7], atol=5e-4, rtol=5e-3)

    # reference loss: left-shift, last=-100, pads NOT masked
    # (core_training_loop.py:52-70) — computed over torch logits
    labels = ids.copy()
    labels[:, :-1] = ids[:, 1:]
    labels[:, -1] = -100
    ref_loss = F.cross_entropy(
        torch.from_numpy(ref_logits[:, :7].reshape(-1, cfg.lm.vocab_size)),
        torch.from_numpy(labels[:, :7].reshape(-1)), ignore_index=-100)

    my_labels = full_model.shift_labels(
        jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        mask_pad=False)
    my_loss, _ = full_model.forward(
        params, cfg, jnp.asarray(pixels), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        labels=jnp.where(jnp.arange(T)[None, :] < 7, my_labels, -100),
        mask_pad_loss=False, bridge_pad_mask=False, remat_lm=False,
        loss_chunk=4)
    np.testing.assert_allclose(
        float(my_loss), float(ref_loss), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_full_stack_no_padding_loss_parity(stacks):
    """Pure parity case: no pads, so the full reference loss (all positions)
    must match the chunked-CE loss exactly."""
    cfg, params, vis, lm, bridge = stacks
    B, T = 2, 8
    rng = np.random.default_rng(1)
    pixels = rng.normal(0, 1, (B, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32)
    ids = rng.integers(3, cfg.lm.vocab_size, (B, T)).astype(np.int64)
    mask = np.ones((B, T), np.int64)

    ref_logits = _torch_full(cfg, vis, lm, bridge, pixels, ids, mask)
    labels = ids.copy()
    labels[:, :-1] = ids[:, 1:]
    labels[:, -1] = -100
    ref_loss = F.cross_entropy(
        torch.from_numpy(ref_logits.reshape(-1, cfg.lm.vocab_size)),
        torch.from_numpy(labels.reshape(-1)), ignore_index=-100)

    my_labels = full_model.shift_labels(
        jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        mask_pad=False)
    my_loss, aux = full_model.forward(
        params, cfg, jnp.asarray(pixels), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), labels=my_labels,
        mask_pad_loss=False, bridge_pad_mask=False, remat_lm=False,
        loss_chunk=4)
    assert int(aux["token_count"]) == B * (T - 1)
    np.testing.assert_allclose(
        float(my_loss), float(ref_loss), atol=1e-4, rtol=1e-4)
