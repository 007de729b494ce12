"""FullModel: frozen DINOv2 + trainable Bridge-Lite + frozen Gemma-2.

Pure-functional assembly of the Encoder-Adapter-Decoder stack
(reference: src/vlm_bridge/model_architecture/full_model.py:82-189):

  vision = DINOv2(pixels)                       # frozen, stop_gradient
  embeds = Gemma2.embed(input_ids)              # raw, pre-normalizer
  bridged = Bridge(embeds, vision)              # trainable
  hidden = Gemma2.forward_hidden(bridged)       # frozen, grads flow THROUGH
  loss = shifted CE (chunked over the 256k vocab)

Design notes (TPU-first):
- The CE loss never materializes the full [B, T, 256k] f32 logit tensor:
  the sequence is processed in chunks under `jax.checkpoint`, so peak memory
  is [B, chunk, V] and the backward pass recomputes per-chunk logits.
- The frozen decoder runs with per-layer rematerialization (`remat_lm`), so
  activations for the 2.6B-param gradient path are O(layers x layer-input).
- Padding is masked both in the loss and in bridge self-attention; the
  reference's unmasked-pad-loss behavior (core_training_loop.py:52-55) is
  available via `mask_pad_loss=False` for exact parity checks.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import VLMConfig
from vlm_bridge_tpu.models import bridge as bridge_mod
from vlm_bridge_tpu.models import dinov2 as dinov2_mod
from vlm_bridge_tpu.models import gemma2 as gemma2_mod


def init(
    rng: jax.Array,
    cfg: VLMConfig,
    *,
    frozen_dtype=jnp.bfloat16,
    bridge_dtype=jnp.float32,
) -> dict:
    """Random-init the full parameter tree. Real deployments overwrite the
    frozen parts via `params.hf_loader` and optionally the bridge via
    `params.torch_bridge`."""
    k_v, k_l, k_b = jax.random.split(rng, 3)
    return {
        "vision": dinov2_mod.init(k_v, cfg.vision, dtype=frozen_dtype),
        "lm": gemma2_mod.init(k_l, cfg.lm, dtype=frozen_dtype),
        "bridge": bridge_mod.init(k_b, cfg.bridge, dtype=bridge_dtype),
    }


def encode_image(params: dict, cfg: VLMConfig, pixel_values: jax.Array) -> jax.Array:
    """Frozen vision forward. pixel_values: [B, H, W, C] normalized."""
    feats = dinov2_mod.forward(params["vision"], cfg.vision, pixel_values)
    return jax.lax.stop_gradient(feats)


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_image_jit(params: dict, cfg: VLMConfig, pixel_values: jax.Array) -> jax.Array:
    """Jitted standalone vision encode for inference paths. (Unjitted op-by-op
    dispatch costs seconds per batch through the remote-TPU tunnel; inside
    the training step this is already fused by the surrounding jit.)"""
    return encode_image(params, cfg, pixel_values)


def bridge_text(
    params: dict,
    cfg: VLMConfig,
    input_ids: jax.Array,
    vision_features: jax.Array,
    *,
    attn_mask: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    bridge_pad_mask: bool = True,
    bridge_causal: bool = False,
) -> jax.Array:
    """Embed text and run the bridge. Returns bridged embeddings [B, T, h].

    bridge_causal: causal-mask the bridge self-attention (see
    bridge.forward's `causal`); default False matches the reference."""
    embeds = gemma2_mod.embed(params["lm"], input_ids)
    embeds = jax.lax.stop_gradient(embeds)
    text_mask = attn_mask if (bridge_pad_mask and attn_mask is not None) else None
    return bridge_mod.forward(
        params["bridge"], cfg.bridge, embeds, vision_features,
        rng=rng, train=train, text_mask=text_mask, causal=bridge_causal,
    )


def forward(
    params: dict,
    cfg: VLMConfig,
    pixel_values: jax.Array,
    input_ids: jax.Array,
    attn_mask: jax.Array,
    *,
    labels: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    mask_pad_loss: bool = True,
    bridge_pad_mask: bool = True,
    bridge_causal: bool = False,
    remat_lm: bool = True,
    loss_chunk: int = 128,
    loss_remat: bool = True,
    return_logits: bool = False,
):
    """Full forward. With `labels` returns (loss, aux); otherwise logits.

    labels: [B, T] target ids aligned per-position (callers build them with
    `shift_labels`); -100 = ignore.
    """
    vision = encode_image(params, cfg, pixel_values)
    bridged = bridge_text(
        params, cfg, input_ids, vision, attn_mask=attn_mask,
        rng=rng, train=train, bridge_pad_mask=bridge_pad_mask,
        bridge_causal=bridge_causal,
    )
    hidden = gemma2_mod.forward_hidden(
        params["lm"], cfg.lm, bridged, attn_mask=attn_mask, remat=remat_lm,
    )
    if labels is None or return_logits:
        logits = gemma2_mod.logits_from_hidden(params["lm"], cfg.lm, hidden)
        if labels is None:
            return logits
        loss, aux = _full_logits_loss(logits, labels)
        return (loss, aux)
    loss, aux = chunked_ce_loss(
        params["lm"], cfg.lm, hidden, labels, chunk=loss_chunk,
        remat=loss_remat,
    )
    return loss, aux


def shift_labels(
    input_ids: jax.Array, attn_mask: jax.Array, *, mask_pad: bool = True
) -> jax.Array:
    """Next-token targets: labels[i] = input_ids[i+1]; last position ignored.

    With mask_pad=True (default, fixes reference bug) positions whose target
    is padding are ignored; mask_pad=False reproduces the reference exactly
    (only the final position is -100, core_training_loop.py:52-55).
    """
    B, T = input_ids.shape
    labels = jnp.concatenate(
        [input_ids[:, 1:], jnp.full((B, 1), -100, input_ids.dtype)], axis=1)
    if mask_pad:
        target_real = jnp.concatenate(
            [attn_mask[:, 1:], jnp.zeros((B, 1), attn_mask.dtype)], axis=1)
        labels = jnp.where(target_real > 0, labels, -100)
    return labels


def _full_logits_loss(logits: jax.Array, labels: jax.Array):
    """CE from materialized logits (tests / tiny models)."""
    logits = logits.astype(jnp.float32)
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, lse - tgt, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    loss = nll.sum() / count
    return loss, {"token_count": count}


def chunked_ce_loss(
    lm_params: dict,
    lm_cfg,
    hidden: jax.Array,
    labels: jax.Array,
    *,
    chunk: int = 128,
    remat: bool = True,
):
    """Memory-efficient CE: sequence chunks, rematerialized logits.

    hidden: [B, T, h]; labels: [B, T] with -100 ignored. With remat=True
    the [B, chunk, V] logits exist only transiently per chunk (forward AND
    backward — costs one extra logits matmul in the backward). remat=False
    trades ~2 GB of saved f32 logit activations for that recompute.
    """
    B, T, H = hidden.shape

    pad_t = (-T) % chunk
    if pad_t:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad_t), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad_t)), constant_values=-100)
    n_chunks = hidden.shape[1] // chunk

    def one_chunk(h_c, y_c):
        # logits_from_hidden handles the tied head's softcap AND its
        # int8-quantized form (loss eval on serving params must not crash)
        logits = gemma2_mod.logits_from_hidden(lm_params, lm_cfg, h_c)
        valid = y_c != -100
        safe = jnp.where(valid, y_c, 0)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, lse - tgt, 0.0)
        return nll.sum(), valid.sum()

    if remat:
        one_chunk = functools.partial(jax.checkpoint, prevent_cse=False)(
            one_chunk)

    h_chunks = hidden.reshape(B, n_chunks, chunk, H).transpose(1, 0, 2, 3)
    y_chunks = labels.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    def scan_body(carry, xs):
        total, count = carry
        s, c = one_chunk(*xs)
        return (total + s, count + c), None

    (total, count), _ = jax.lax.scan(
        scan_body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (h_chunks, y_chunks),
    )
    count = jnp.maximum(count, 1)
    return total / count, {"token_count": count}


def trainable_params(params: dict) -> dict:
    """The bridge subtree — the only trainable part (reference freezes both
    encoders, full_model.py:82-93)."""
    return params["bridge"]


def merge_trainable(params: dict, bridge_params: dict) -> dict:
    out = dict(params)
    out["bridge"] = bridge_params
    return out
