"""Single init->shard->jit setup path for the training stack.

bench.py, __graft_entry__.dryrun_multichip, and the orchestrator's
prepare_environment all need the same sequence: init (or accept) params,
build the ("data","model") mesh, shard params/state, and jit the train/eval
steps under the mesh. Round 1 hand-rolled this three times and the copies
drifted (bench hardcoded a divergent steps_per_epoch); this module is now the
only implementation.

Replaces the model/optimizer/device-placement half of the reference's
prepare_environment (reference: src/vlm_bridge/training_strategy/
training_setup.py:118-188) — loaders/logging stay with the orchestrator.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import TrainingConfig, VLMConfig
from vlm_bridge_tpu.models import full_model
from vlm_bridge_tpu.parallel import auto_mesh, replicate, shard_params
from vlm_bridge_tpu.training.train_step import (
    TrainState, init_train_state, make_eval_step, make_schedule,
    make_train_step, split_frozen)


@dataclass
class Stack:
    """The jit-ready training stack (everything but loaders/logging)."""

    cfg: VLMConfig
    mesh: Any
    frozen: dict
    state: TrainState
    opt: Any
    schedule: Any
    train_step: Any
    eval_step: Any
    activation_dtype: Any
    steps_per_epoch: int


def resolve_activation_dtype(tc: TrainingConfig):
    """bf16 under AMP (fp16 maps to bf16 on TPU), else f32 — derived from the
    reference-compatible use_amp/amp_dtype fields (reference
    configure_hardware_and_precision, training_setup.py:191-225)."""
    if tc.use_amp and tc.amp_dtype in ("bfloat16", "float16"):
        return jnp.bfloat16
    return jnp.float32


def build_mesh(tc: TrainingConfig, devices=None):
    """("data","model") mesh from tc.mesh_shape; -1 = fill with devices."""
    ms = tuple(tc.mesh_shape or (-1,))
    data_ax = ms[0]
    model_ax = ms[1] if len(ms) > 1 else 1
    devices = list(devices if devices is not None else jax.devices())
    if data_ax == -1:
        data_ax = len(devices) // model_ax
    return auto_mesh(data=data_ax, model=model_ax,
                     devices=devices[: data_ax * model_ax])


def init_params(tc: TrainingConfig, cfg: Optional[VLMConfig] = None,
                *, frozen_dtype=None) -> dict:
    """Random init + optional HF snapshot loads (vision / LM)."""
    cfg = cfg or tc.model_config()
    kw = {} if frozen_dtype is None else {"frozen_dtype": frozen_dtype}
    params = full_model.init(jax.random.key(tc.seed), cfg, **kw)
    if tc.hf_vision_path:
        from vlm_bridge_tpu.params.hf_loader import load_dinov2

        params["vision"] = load_dinov2(
            tc.hf_vision_path, cfg.vision,
            target_grids=(cfg.image_size // cfg.vision.patch_size,))
    if tc.hf_lm_path:
        from vlm_bridge_tpu.params.hf_loader import load_gemma2

        params["lm"] = load_gemma2(tc.hf_lm_path, cfg.lm)
    return params


def build_stack(
    tc: TrainingConfig,
    *,
    params: Optional[dict] = None,
    mesh=None,
    steps_per_epoch: int,
    activation_dtype=None,
    frozen_dtype=None,
) -> Stack:
    """init -> shard -> TrainState -> jitted steps, under one mesh."""
    cfg = tc.model_config()
    if activation_dtype is None:
        activation_dtype = resolve_activation_dtype(tc)
    if params is None:
        params = init_params(tc, cfg, frozen_dtype=frozen_dtype)
    if mesh is None:
        mesh = build_mesh(tc)

    state, opt = init_train_state(params, tc, steps_per_epoch)
    schedule = make_schedule(tc, steps_per_epoch)

    if tc.scan_layers:
        # re-lay the frozen LM for the lax.scan-over-layer-pairs forward
        # BEFORE sharding so the TP rules apply to the stacked leaves
        # (parallel/sharding._LM_TP_RULES layers_scan patterns). Decode
        # consumers rebuild per-layer dicts via gemma2.unstack_scan_layers.
        from vlm_bridge_tpu.models import gemma2

        params = {**params, "lm": gemma2.stack_layers_for_scan(
            params["lm"], cfg.lm, free_layers=True)}
    params = shard_params(mesh, params)
    frozen = split_frozen(params)
    state = TrainState(
        step=jax.device_put(state.step, replicate(mesh)),
        bridge_params=shard_params(mesh, state.bridge_params),
        opt_state=jax.device_put(state.opt_state, replicate(mesh)),
    )

    with mesh:
        train_step = make_train_step(
            cfg, tc, opt, schedule, activation_dtype=activation_dtype)
        eval_step = make_eval_step(cfg, tc, activation_dtype=activation_dtype)

    return Stack(
        cfg=cfg, mesh=mesh, frozen=frozen, state=state, opt=opt,
        schedule=schedule, train_step=train_step, eval_step=eval_step,
        activation_dtype=activation_dtype, steps_per_epoch=steps_per_epoch)
