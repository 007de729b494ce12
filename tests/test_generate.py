"""Generation tests.

The oracle for `exact` mode is an explicit python loop that re-runs the full
model per token exactly as the reference does (full_model.py:241-373: grow
the sequence, full forward, take last-position logits). The jitted exact mode
must reproduce it token-for-token; fast (KV-cache) mode must agree on shapes,
EOS handling, and the first generated token (where causal == bidirectional).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import VLMConfig
from vlm_bridge_tpu.inference import GenerationConfig, generate_tokens
from vlm_bridge_tpu.models import full_model, gemma2


@pytest.fixture(scope="module")
def setup():
    cfg = VLMConfig.tiny_test()
    params = full_model.init(jax.random.key(0), cfg, frozen_dtype=jnp.float32)
    B = 2
    pixels = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (B, cfg.image_size, cfg.image_size, 3)),
        jnp.float32)
    vision = full_model.encode_image(params, cfg, pixels)
    return cfg, params, vision


def _reference_style_greedy(params, cfg, vision, max_length):
    """Grow-the-sequence greedy loop (no cache, bidirectional bridge) —
    mirrors the reference generation semantics."""
    B = vision.shape[0]
    tokens = np.full((B, 1), cfg.lm.bos_token_id, np.int32)
    done = np.zeros((B,), bool)
    for _ in range(max_length):
        ids = jnp.asarray(tokens)
        mask = jnp.ones(tokens.shape, jnp.int32)
        bridged = full_model.bridge_text(
            params, cfg, ids, vision, attn_mask=mask, bridge_pad_mask=True)
        hidden = gemma2.forward_hidden(
            params["lm"], cfg.lm, bridged, attn_mask=mask, remat=False)
        logits = gemma2.logits_from_hidden(
            params["lm"], cfg.lm, hidden[:, -1:])[:, 0]
        nxt = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
        nxt = np.where(done, cfg.lm.pad_token_id, nxt)
        done |= nxt == cfg.lm.eos_token_id
        tokens = np.concatenate([tokens, nxt[:, None]], axis=1)
    return tokens


@pytest.mark.slow
def test_exact_mode_matches_reference_loop(setup):
    cfg, params, vision = setup
    N = 6
    ref = _reference_style_greedy(params, cfg, vision, N)
    toks, lengths = generate_tokens(
        params, cfg, vision_features=vision,
        gen=GenerationConfig(max_length=N, greedy=True, exact=True),
        activation_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(toks), ref)


def test_fast_mode_contract(setup):
    cfg, params, vision = setup
    N = 8
    toks, lengths = generate_tokens(
        params, cfg, vision_features=vision,
        gen=GenerationConfig(max_length=N, greedy=True),
        activation_dtype=jnp.float32)
    toks = np.asarray(toks)
    assert toks.shape == (2, N + 1)
    assert (toks[:, 0] == cfg.lm.bos_token_id).all()
    # after an EOS, only pads
    for b in range(2):
        eos_pos = np.where(toks[b] == cfg.lm.eos_token_id)[0]
        if len(eos_pos):
            assert (toks[b, eos_pos[0] + 1:] == cfg.lm.pad_token_id).all()
            assert lengths[b] == eos_pos[0]

    # first generated token agrees with exact mode (prefix len 1 ⇒ the
    # causal-bridge approximation is exact there)
    toks_exact, _ = generate_tokens(
        params, cfg, vision_features=vision,
        gen=GenerationConfig(max_length=1, greedy=True, exact=True),
        activation_dtype=jnp.float32)
    np.testing.assert_array_equal(toks[:, 1], np.asarray(toks_exact)[:, 1])


def test_fast_mode_is_exact_for_causal_bridge(setup):
    """With the causal bridge (GenerationConfig.bridge_causal /
    TrainingConfig.bridge_causal) the KV-cached fast decode is not an
    approximation: it must reproduce the full-reforward causal decode
    token-for-token at EVERY position, not just the first. This is the
    contract that makes the round-4 memorization proof transfer from
    teacher-forced training to serving (tools/memorize.py)."""
    cfg, params, vision = setup
    N = 8
    fast, fast_len = generate_tokens(
        params, cfg, vision_features=vision,
        gen=GenerationConfig(max_length=N, greedy=True),
        activation_dtype=jnp.float32)
    exact, exact_len = generate_tokens(
        params, cfg, vision_features=vision,
        gen=GenerationConfig(max_length=N, greedy=True, exact=True,
                             bridge_causal=True),
        activation_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(exact))
    np.testing.assert_array_equal(np.asarray(fast_len), np.asarray(exact_len))


def test_sampling_reproducible_and_temperature_varies(setup):
    cfg, params, vision = setup
    g = GenerationConfig(max_length=6, temperature=0.9, top_p=0.9)
    a, _ = generate_tokens(params, cfg, vision_features=vision,
                           rng=jax.random.key(3), gen=g,
                           activation_dtype=jnp.float32)
    b, _ = generate_tokens(params, cfg, vision_features=vision,
                           rng=jax.random.key(3), gen=g,
                           activation_dtype=jnp.float32)
    c, _ = generate_tokens(params, cfg, vision_features=vision,
                           rng=jax.random.key(4), gen=g,
                           activation_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_pixel_input_path(setup):
    cfg, params, _ = setup
    pixels = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    toks, _ = generate_tokens(
        params, cfg, pixel_values=pixels,
        gen=GenerationConfig(max_length=3, greedy=True),
        activation_dtype=jnp.float32)
    assert np.asarray(toks).shape == (1, 4)


def test_early_stop_matches_scan(setup):
    """while_loop early-exit mode must produce identical tokens/lengths to
    the fixed-length scan (it only skips provably-dead tail steps)."""
    cfg, params, vision = setup
    N = 8
    a, la = generate_tokens(
        params, cfg, vision_features=vision,
        gen=GenerationConfig(max_length=N, greedy=True),
        activation_dtype=jnp.float32)
    b, lb = generate_tokens(
        params, cfg, vision_features=vision,
        gen=GenerationConfig(max_length=N, greedy=True, early_stop=True),
        activation_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_early_stop_with_sampling(setup):
    cfg, params, vision = setup
    g = dict(max_length=6, temperature=0.9, top_p=0.9)
    a, _ = generate_tokens(params, cfg, vision_features=vision,
                           rng=jax.random.key(5),
                           gen=GenerationConfig(**g),
                           activation_dtype=jnp.float32)
    b, _ = generate_tokens(params, cfg, vision_features=vision,
                           rng=jax.random.key(5),
                           gen=GenerationConfig(**g, early_stop=True),
                           activation_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generate_under_8device_mesh(setup):
    """Data-parallel decode: batch-sharded vision over the 8-device CPU mesh
    must reproduce single-device outputs (multi-chip serving path)."""
    from vlm_bridge_tpu.parallel import auto_mesh, batch_sharding, replicate

    cfg, params, vision = setup
    if vision.shape[0] % 2:
        pytest.skip("need even batch")
    mesh = auto_mesh(data=2, model=1, devices=jax.devices()[:2])
    v_sharded = jax.device_put(vision, batch_sharding(mesh, vision.ndim))
    p_repl = jax.device_put(params, replicate(mesh))

    want, lw = generate_tokens(
        params, cfg, vision_features=vision,
        gen=GenerationConfig(max_length=5, greedy=True),
        activation_dtype=jnp.float32)
    got, lg = generate_tokens(
        p_repl, cfg, vision_features=v_sharded,
        gen=GenerationConfig(max_length=5, greedy=True),
        activation_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lw))


def test_generate_under_tp_mesh(setup):
    """(data=4, model=2) mesh: batch-sharded decode with a TENSOR-PARALLEL
    frozen LM (the gemma2_9b serving story, parallel/sharding._LM_TP_RULES)
    must reproduce single-device outputs token-for-token."""
    from vlm_bridge_tpu.parallel import auto_mesh, shard_params

    cfg, params, vision = setup
    B = 8
    vision8 = jnp.concatenate([vision] * (B // vision.shape[0]), axis=0)
    mesh = auto_mesh(data=4, model=2, devices=jax.devices()[:8])
    p_sharded = shard_params(mesh, params)  # lm TP-sharded, rest replicated

    want, lw = generate_tokens(
        params, cfg, vision_features=vision8,
        gen=GenerationConfig(max_length=5, greedy=True),
        activation_dtype=jnp.float32)
    got, lg = generate_tokens(
        p_sharded, cfg, vision_features=vision8,
        gen=GenerationConfig(max_length=5, greedy=True),
        activation_dtype=jnp.float32, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lw))


def test_generate_mesh_batch_divisibility_error(setup):
    from vlm_bridge_tpu.parallel import auto_mesh, shard_params

    cfg, params, vision = setup  # B=2, data axis 4 -> must raise
    mesh = auto_mesh(data=4, model=1, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="divide the mesh"):
        generate_tokens(
            shard_params(mesh, params), cfg, vision_features=vision,
            gen=GenerationConfig(max_length=3, greedy=True), mesh=mesh)


def test_stacked_only_params_raise_clear_error(setup):
    """Layer-streamed builds (bench._stream_quantized_params) drop the
    per-layer LM weights after stacking; any path that cannot dispatch the
    fused Pallas decode must fail with a ValueError, not a KeyError deep
    inside decode_step."""
    import dataclasses

    cfg, params, vision = setup
    lm_cfg = dataclasses.replace(cfg.lm, sliding_window=128)
    cfg2 = dataclasses.replace(cfg, lm=lm_cfg)
    qlm = gemma2.quantize_params(params["lm"], parts=("embedding", "mlp",
                                                      "attn"))
    stacked = {k: v for k, v in qlm.items() if k != "layers"}
    stacked["stacked_decode"] = gemma2.stack_decode_params(qlm, lm_cfg)
    p2 = {**params, "lm": stacked}
    # exact mode has no fused path at all
    with pytest.raises(ValueError, match="pre-stacked"):
        generate_tokens(p2, cfg2, vision_features=vision,
                        gen=GenerationConfig(max_length=5, greedy=True,
                                             exact=True))
    # fast mode without the int8-KV serving recipe cannot dispatch either
    with pytest.raises(ValueError, match="pre-stacked"):
        generate_tokens(p2, cfg2, vision_features=vision,
                        gen=GenerationConfig(max_length=5, greedy=True,
                                             kv_quant=False))
