"""Jitted training and evaluation steps.

Replaces the reference per-batch loop body
(reference: src/vlm_bridge/training_strategy/core_training_loop.py:16-134):
left-shifted CE (pad-masked — fixing the reference's unmasked-pad loss),
global-norm grad clip 0.3, AdamW over bridge params only, cosine/linear/
constant LR stepped per batch, grad-norm-before-clip metric.

TPU-first details:
- one fused `train_step` under jit: forward (frozen encoders stop-gradiented,
  frozen LM rematerialized) + backward + clip + AdamW update, with the train
  state donated so bridge params/optimizer state update in place
- bf16 activations; bridge master params f32 (cast to bf16 inside the fwd);
  AdamW moments f32 — equivalent to the reference's AMP + f32 master weights
- batch-dim sharding over the "data" mesh axis makes this data-parallel:
  XLA inserts the bridge-grad psum over ICI automatically
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vlm_bridge_tpu.configs import TrainingConfig, VLMConfig
from vlm_bridge_tpu.data.preprocess import normalize_on_device
from vlm_bridge_tpu.models import full_model


class TrainState(NamedTuple):
    step: jax.Array           # [] int32, global step
    bridge_params: dict       # f32 master copy
    opt_state: optax.OptState


def make_schedule(tc: TrainingConfig, steps_per_epoch: int):
    """LR schedule stepped per OPTIMIZER step over the full run (reference
    create_scheduler, training_setup.py:284-326). steps_per_epoch counts
    microbatches; under gradient accumulation the schedule only advances
    once per effective batch, so the horizon divides by k."""
    accum = max(1, tc.gradient_accumulation_steps)
    total = max(1, tc.num_epochs * steps_per_epoch // accum)
    if not tc.use_scheduler or tc.scheduler_type == "constant":
        return optax.constant_schedule(tc.learning_rate)
    if tc.scheduler_type == "cosine":
        return optax.cosine_decay_schedule(
            init_value=tc.learning_rate, decay_steps=total,
            alpha=tc.min_lr / tc.learning_rate)
    if tc.scheduler_type == "linear":
        return optax.linear_schedule(
            init_value=tc.learning_rate, end_value=tc.min_lr,
            transition_steps=total)
    raise ValueError(f"unknown scheduler_type: {tc.scheduler_type}")


def make_optimizer(tc: TrainingConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """clip(0.3) -> AdamW(b1=.9, b2=.999, eps=1e-8, wd=0.01) with schedule
    (reference create_optimizer, training_setup.py:228-257).

    gradient_accumulation_steps > 1 wraps the chain in optax.MultiSteps:
    grads average over k microbatches and clip/AdamW/schedule apply once per
    effective batch (full-batch semantics at k-times-smaller memory)."""
    opt = optax.chain(
        optax.clip_by_global_norm(tc.gradient_clip_val),
        optax.adamw(
            learning_rate=make_schedule(tc, steps_per_epoch),
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=tc.weight_decay,
        ),
    )
    if tc.gradient_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, tc.gradient_accumulation_steps)
    return opt


def init_train_state(
    params: dict, tc: TrainingConfig, steps_per_epoch: int
) -> Tuple[TrainState, optax.GradientTransformation]:
    opt = make_optimizer(tc, steps_per_epoch)
    bridge = full_model.trainable_params(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        bridge_params=bridge,
        opt_state=opt.init(bridge),
    ), opt


def _prep_pixels(pixel_values, activation_dtype):
    if pixel_values.dtype == jnp.uint8:
        return normalize_on_device(pixel_values, dtype=activation_dtype)
    return pixel_values.astype(activation_dtype)


def make_train_step(
    cfg: VLMConfig,
    tc: TrainingConfig,
    opt: optax.GradientTransformation,
    schedule,
    *,
    activation_dtype=jnp.bfloat16,
):
    """Build the jitted train step: (state, frozen, batch, rng) -> (state, metrics).

    rng is a BASE key: it is folded with the device-side step counter inside
    the graph, so callers can pass the same key every step without a host
    readback of `state.step` (the round-1 loop's per-step `int(state.step)`
    sync serialized dispatch against device execution)."""

    def step_fn(state: TrainState, frozen: dict, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        pixels = _prep_pixels(batch["pixel_values"], activation_dtype)
        input_ids = batch["input_ids"]
        attn_mask = batch["attn_mask"]
        labels = full_model.shift_labels(
            input_ids, attn_mask, mask_pad=tc.mask_pad_loss)

        def loss_fn(bridge_params):
            params = {**frozen, "bridge": jax.tree.map(
                lambda p: p.astype(activation_dtype), bridge_params)}
            loss, aux = full_model.forward(
                params, cfg, pixels, input_ids, attn_mask,
                labels=labels, rng=rng, train=True,
                mask_pad_loss=tc.mask_pad_loss,
                bridge_causal=tc.bridge_causal,
                remat_lm=tc.remat_lm, loss_chunk=tc.loss_chunk_size,
                loss_remat=tc.loss_remat,
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.bridge_params)
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = opt.update(
            grads, state.opt_state, state.bridge_params)
        new_bridge = optax.apply_updates(state.bridge_params, updates)
        new_state = TrainState(state.step + 1, new_bridge, new_opt_state)
        metrics = {
            "loss": loss,
            "grad_norm_before_clip": grad_norm,
            # state.step counts microbatches; the schedule advances once per
            # optimizer step
            "learning_rate": schedule(
                state.step // tc.gradient_accumulation_steps),
            "token_count": aux["token_count"],
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(cfg: VLMConfig, tc: TrainingConfig, *, activation_dtype=jnp.bfloat16):
    """Validation step: loss + perplexity + sequence stats
    (reference run_validation_epoch, core_training_loop.py:137-254)."""

    def step_fn(frozen: dict, bridge_params: dict, batch: dict):
        pixels = _prep_pixels(batch["pixel_values"], activation_dtype)
        input_ids = batch["input_ids"]
        attn_mask = batch["attn_mask"]
        labels = full_model.shift_labels(
            input_ids, attn_mask, mask_pad=tc.mask_pad_loss)
        params = {**frozen, "bridge": jax.tree.map(
            lambda p: p.astype(activation_dtype), bridge_params)}
        loss, aux = full_model.forward(
            params, cfg, pixels, input_ids, attn_mask, labels=labels,
            mask_pad_loss=tc.mask_pad_loss, bridge_causal=tc.bridge_causal,
            remat_lm=False, loss_chunk=tc.loss_chunk_size,
        )
        seq_lens = attn_mask.sum(axis=1)
        return {
            "loss": loss,
            "token_count": aux["token_count"],
            "avg_sequence_length": seq_lens.mean(),
        }

    return jax.jit(step_fn)


def split_frozen(params: dict) -> dict:
    """The non-trainable subtree (vision + lm)."""
    return {k: v for k, v in params.items() if k != "bridge"}
