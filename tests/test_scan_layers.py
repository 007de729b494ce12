"""lax.scan-over-layer-pairs LM forward (TrainingConfig.scan_layers).

The unrolled 26-layer trace costs ~8 min of XLA compile per pad bucket on
TPU (round-4 verdict weak #4); the scan layout compiles a 2-layer body
once. These tests pin: (1) the scan forward is numerically the unrolled
forward, (2) the layout round-trips, (3) the TP sharding rules cover the
stacked leaves, (4) a training stack built with scan_layers=True trains and
its loss tracks the unrolled stack, (5) generation transparently unstacks.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import Gemma2Config, TrainingConfig, VLMConfig
from vlm_bridge_tpu.models import gemma2


@pytest.fixture(scope="module")
def lm_setup():
    # odd layer count exercises the "tail" path on top of the (a, b) pairs
    cfg = dataclasses.replace(Gemma2Config.tiny_test(), num_layers=5)
    params = gemma2.init(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 0.3, (2, 9, cfg.hidden_size)), jnp.float32)
    mask = jnp.asarray([[1] * 9, [1] * 6 + [0] * 3], jnp.int32)
    return cfg, params, x, mask


@pytest.mark.parametrize("remat", [False, True])
def test_scan_forward_matches_unrolled(lm_setup, remat):
    cfg, params, x, mask = lm_setup
    want = gemma2.forward_hidden(params, cfg, x, attn_mask=mask, remat=remat)
    stacked = gemma2.stack_layers_for_scan(params, cfg, free_layers=True)
    assert "layers" not in stacked and "tail" in stacked["layers_scan"]
    got = gemma2.forward_hidden(stacked, cfg, x, attn_mask=mask, remat=remat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_scan_grads_match_unrolled(lm_setup):
    """Gradients THROUGH the frozen scan forward (the training contract:
    bridge grads flow through the LM) match the unrolled forward's."""
    cfg, params, x, mask = lm_setup
    stacked = gemma2.stack_layers_for_scan(params, cfg, free_layers=True)

    def loss(inp, p):
        h = gemma2.forward_hidden(p, cfg, inp, attn_mask=mask, remat=True)
        return (h.astype(jnp.float32) ** 2).mean()

    g_want = jax.grad(loss)(x, params)
    g_got = jax.grad(loss)(x, stacked)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-6)


def test_unstack_round_trips(lm_setup):
    cfg, params, _, _ = lm_setup
    stacked = gemma2.stack_layers_for_scan(params, cfg, free_layers=True)
    back = gemma2.unstack_scan_layers(stacked, cfg)
    assert set(back["layers"]) == set(params["layers"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        back["layers"], params["layers"])
    assert "layers_scan" not in back


def test_even_layer_count_has_no_tail():
    cfg = dataclasses.replace(Gemma2Config.tiny_test(), num_layers=4)
    params = gemma2.init(jax.random.key(0), cfg, dtype=jnp.float32)
    stacked = gemma2.stack_layers_for_scan(params, cfg, free_layers=True)
    assert set(stacked["layers_scan"]) == {"a", "b"}
    assert stacked["layers_scan"]["a"]["attn"]["q"].shape[0] == 2


def test_quantized_layers_refused():
    cfg = Gemma2Config.tiny_test()
    params = gemma2.init(jax.random.key(0), cfg, dtype=jnp.float32)
    qparams = gemma2.quantize_params(params)
    with pytest.raises(ValueError, match="training-path layout"):
        gemma2.stack_layers_for_scan(qparams, cfg)


def test_tp_rules_cover_scan_layout():
    """param_shardings must shard the stacked leaves over "model" with the
    pair axis left unsharded (same rules as per-layer, shifted one axis)."""
    from vlm_bridge_tpu.parallel import auto_mesh
    from vlm_bridge_tpu.parallel.sharding import param_shardings

    cfg = dataclasses.replace(Gemma2Config.tiny_test(), num_layers=5)
    lm = gemma2.init(jax.random.key(0), cfg, dtype=jnp.float32)
    params = {"lm": gemma2.stack_layers_for_scan(lm, cfg, free_layers=True)}
    mesh = auto_mesh(data=4, model=2, devices=jax.devices()[:8])
    sh = param_shardings(mesh, params)
    scan_sh = sh["lm"]["layers_scan"]
    assert scan_sh["a"]["attn"]["q"].spec == jax.sharding.PartitionSpec(
        None, None, "model")
    assert scan_sh["b"]["mlp"]["down"].spec == jax.sharding.PartitionSpec(
        None, "model", None)
    assert scan_sh["tail"]["attn"]["o"].spec == jax.sharding.PartitionSpec(
        "model", None)
    assert sh["lm"]["embedding"].spec == jax.sharding.PartitionSpec(
        None, None)


def test_training_stack_scan_matches_unrolled_loss():
    """Two jitted train steps with scan_layers=True produce the same losses
    as the unrolled stack (same math, different program shape)."""
    from vlm_bridge_tpu.parallel import shard_batch
    from vlm_bridge_tpu.training.stack import build_stack, init_params

    def run(scan):
        tc = TrainingConfig(model_preset="tiny_test", batch_size=8,
                            loss_chunk_size=16, max_text_len=16,
                            scan_layers=scan, use_amp=False)
        cfg = tc.model_config()
        params = init_params(tc, cfg, frozen_dtype=jnp.float32)
        stack = build_stack(tc, params=params, steps_per_epoch=10,
                            activation_dtype=jnp.float32,
                            frozen_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        B = tc.batch_size
        batch = shard_batch(stack.mesh, {
            "pixel_values": rng.integers(
                0, 256, (B, cfg.image_size, cfg.image_size, 3), np.uint8),
            "input_ids": rng.integers(
                3, cfg.lm.vocab_size, (B, 16)).astype(np.int32),
            "attn_mask": np.ones((B, 16), np.int32),
        })
        losses = []
        state = stack.state
        with stack.mesh:
            for _ in range(2):
                state, metrics = stack.train_step(
                    state, stack.frozen, batch, jax.random.key(1))
                losses.append(float(metrics["loss"]))
        return losses, stack

    want, _ = run(scan=False)
    got, stack = run(scan=True)
    assert "layers_scan" in stack.frozen["lm"]
    assert "layers" not in stack.frozen["lm"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_generate_unstacks_scan_layout():
    """generate_tokens serves from a scan-layout params tree (the
    orchestrator's mid-training sample generation under scan_layers)."""
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)
    from vlm_bridge_tpu.models import full_model

    cfg = VLMConfig.tiny_test()
    params = full_model.init(jax.random.key(3), cfg, frozen_dtype=jnp.float32)
    vision = full_model.encode_image(params, cfg, jnp.zeros(
        (2, cfg.image_size, cfg.image_size, 3), jnp.float32))
    gen = GenerationConfig(max_length=5, greedy=True)
    want, _ = generate_tokens(params, cfg, vision_features=vision, gen=gen,
                              activation_dtype=jnp.float32)

    sparams = {**params, "lm": gemma2.stack_layers_for_scan(
        params["lm"], cfg.lm, free_layers=True)}
    got, _ = generate_tokens(sparams, cfg, vision_features=vision, gen=gen,
                             activation_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
