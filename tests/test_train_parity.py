"""Multi-step training-trajectory parity vs torch (SURVEY.md §7 stage 6).

Runs N identical AdamW steps on the SAME tiny stack in both frameworks —
torch: reference-style loop (CE over logits incl. pads, clip_grad_norm_ 0.3,
torch.optim.AdamW, constant LR; reference core_training_loop.py:40-104,
training_setup.py:228-257) vs JAX: full_model.forward(mask_pad_loss=False)
+ optax clip_by_global_norm + adamw — and requires the per-step losses and
final bridge weights to track each other. This pins down optimizer
semantics (decoupled weight decay, bias correction, global-norm clipping),
not just single-forward numerics.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from vlm_bridge_tpu.configs import VLMConfig
from vlm_bridge_tpu.models import full_model
from vlm_bridge_tpu.params.hf_loader import (
    dinov2_from_state_dict, gemma2_from_state_dict)
from vlm_bridge_tpu.params.torch_bridge import bridge_to_state_dict

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from test_full_model_parity import _Bridge  # noqa: E402

LR = 3e-3
WD = 0.01
CLIP = 0.3
STEPS = 8


def _no_dropout(cfg: VLMConfig) -> VLMConfig:
    return dataclasses.replace(
        cfg, bridge=dataclasses.replace(cfg.bridge, dropout=0.0))


@pytest.fixture(scope="module")
def stacks():
    from transformers import Dinov2Config as HFDino
    from transformers import Gemma2Config as HFGemma
    from transformers.models.dinov2.modeling_dinov2 import Dinov2Model
    from transformers.models.gemma2.modeling_gemma2 import Gemma2ForCausalLM

    cfg = _no_dropout(VLMConfig.tiny_test())
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
    for p in vis.parameters():
        p.requires_grad_(False)
    for p in lm.parameters():
        p.requires_grad_(False)

    params = full_model.init(jax.random.key(0), cfg, frozen_dtype=jnp.float32)
    params["vision"] = dinov2_from_state_dict(
        vis.state_dict(), cfg.vision, dtype=jnp.float32,
        target_grids=(cfg.image_size // cfg.vision.patch_size,))
    params["lm"] = gemma2_from_state_dict(lm.state_dict(), cfg.lm,
                                          dtype=jnp.float32)

    bridge = _Bridge(cfg.bridge)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in bridge_to_state_dict(params["bridge"], cfg.bridge).items()}
    bridge.load_state_dict(sd, strict=True)
    bridge.train()  # dropout=0 so train vs eval is equivalent; grads enabled
    return cfg, params, vis, lm, bridge


@pytest.mark.slow
def test_adamw_trajectory_parity(stacks):
    cfg, params, vis, lm, bridge = stacks
    B, T = 2, 8
    rng = np.random.default_rng(0)
    batches = [
        (rng.normal(0, 1, (B, cfg.image_size, cfg.image_size, 3))
            .astype(np.float32),
         rng.integers(3, cfg.lm.vocab_size, (B, T)).astype(np.int64))
        for _ in range(STEPS)
    ]
    mask = np.ones((B, T), np.int64)

    # ---- torch reference loop ------------------------------------------
    opt_t = torch.optim.AdamW(bridge.parameters(), lr=LR, betas=(0.9, 0.999),
                              eps=1e-8, weight_decay=WD)
    torch_losses = []
    for pixels, ids in batches:
        px = torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        with torch.no_grad():
            vision = vis(px).last_hidden_state
            embeds = lm.get_input_embeddings()(torch.from_numpy(ids))
        bridged = bridge(embeds, vision)
        logits = lm(inputs_embeds=bridged,
                    attention_mask=torch.from_numpy(mask)).logits
        labels = ids.copy()
        labels[:, :-1] = ids[:, 1:]
        labels[:, -1] = -100
        loss = F.cross_entropy(
            logits.view(-1, cfg.lm.vocab_size),
            torch.from_numpy(labels).view(-1), ignore_index=-100)
        opt_t.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(bridge.parameters(), CLIP)
        opt_t.step()
        torch_losses.append(float(loss))

    # ---- JAX loop -------------------------------------------------------
    opt_j = optax.chain(
        optax.clip_by_global_norm(CLIP),
        optax.adamw(optax.constant_schedule(LR), b1=0.9, b2=0.999,
                    eps=1e-8, weight_decay=WD))
    bridge_params = params["bridge"]
    opt_state = opt_j.init(bridge_params)

    @jax.jit
    def step(bp, os, pixels, ids):
        def loss_fn(bp):
            labels = full_model.shift_labels(ids, jnp.ones_like(ids),
                                             mask_pad=False)
            loss, _ = full_model.forward(
                {**params, "bridge": bp}, cfg, pixels, ids,
                jnp.ones_like(ids), labels=labels, mask_pad_loss=False,
                bridge_pad_mask=False, remat_lm=False, loss_chunk=4)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(bp)
        updates, os = opt_j.update(grads, os, bp)
        return optax.apply_updates(bp, updates), os, loss

    jax_losses = []
    for pixels, ids in batches:
        bridge_params, opt_state, loss = step(
            bridge_params, opt_state, jnp.asarray(pixels),
            jnp.asarray(ids, jnp.int32))
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, atol=2e-3, rtol=2e-3)

    # final weights must still agree after 8 optimizer steps
    final_t = {k: v.detach().numpy() for k, v in bridge.state_dict().items()}
    final_j = bridge_to_state_dict(bridge_params, cfg.bridge)
    worst = 0.0
    for k in final_t:
        d = np.max(np.abs(final_t[k] - final_j[k]))
        worst = max(worst, float(d))
    # Adam's grad/sqrt(v) normalization amplifies f32 noise; ~1e-3-scale
    # absolute drift after 8 steps at lr=3e-3 is parity, not a bug.
    assert worst < 2e-3, f"max weight divergence {worst}"
