"""Int8 KV-cache correctness.

The quantized cache (gemma2.KVCache with dtype=int8, per-key-vector scales)
must (a) round-trip values within half a quantization step, (b) leave the
prefill hidden states bit-identical (prefill attention consumes the in-flight
K/V, not the cache), and (c) keep multi-step decode hidden states within
int8-quantization tolerance of the bf16/f32-cache run — including ragged
rows, sliding-window layers, and the full generation loop.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import Gemma2Config, VLMConfig
from vlm_bridge_tpu.models import full_model, gemma2


def _tiny():
    cfg = Gemma2Config.tiny_test()
    params = gemma2.init(jax.random.key(0), cfg, dtype=jnp.float32)
    return cfg, params


def test_quantize_kv_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 3, (5, 7, 16)), jnp.float32)
    q, scale = gemma2.quantize_kv(x)
    assert q.dtype == jnp.int8 and scale.shape == (5, 7)
    deq = q.astype(jnp.float32) * scale[..., None]
    # symmetric absmax: error bounded by half a step per element
    err = np.abs(np.asarray(deq - x))
    assert (err <= np.asarray(scale)[..., None] / 2 + 1e-6).all()
    # zero vectors stay exactly zero
    q0, s0 = gemma2.quantize_kv(jnp.zeros((3, 4)))
    assert not np.asarray(q0).any()


def test_prefill_hidden_unchanged_and_cache_close():
    cfg, params = _tiny()
    B, T, L = 2, 6, 12
    rng = np.random.default_rng(1)
    embeds = jnp.asarray(rng.normal(0, 1, (B, T, cfg.hidden_size)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0]], jnp.int32)

    h_f, c_f = gemma2.prefill(
        params, cfg, embeds, gemma2.KVCache.zeros(cfg, B, L, jnp.float32),
        attn_mask=mask)
    h_q, c_q = gemma2.prefill(
        params, cfg, embeds, gemma2.KVCache.zeros(cfg, B, L, jnp.int8),
        attn_mask=mask)

    np.testing.assert_array_equal(np.asarray(h_f), np.asarray(h_q))
    assert c_q.k.dtype == jnp.int8 and c_q.quantized
    np.testing.assert_array_equal(np.asarray(c_f.length), np.asarray(c_q.length))
    deq = np.asarray(c_q.k[:, :, :T].astype(jnp.float32)
                     * c_q.k_scale[:, :, :T, :, None])
    ref = np.asarray(c_f.k[:, :, :T], np.float32)
    np.testing.assert_allclose(deq, ref, atol=np.abs(ref).max() / 200)


def test_decode_steps_close_to_unquantized():
    cfg, params = _tiny()
    B, T, L = 2, 5, 16
    rng = np.random.default_rng(2)
    embeds = jnp.asarray(rng.normal(0, 1, (B, T, cfg.hidden_size)), jnp.float32)
    mask = jnp.asarray([[1] * 5, [1, 1, 1, 0, 0]], jnp.int32)

    _, c_f = gemma2.prefill(
        params, cfg, embeds, gemma2.KVCache.zeros(cfg, B, L, jnp.float32),
        attn_mask=mask)
    _, c_q = gemma2.prefill(
        params, cfg, embeds, gemma2.KVCache.zeros(cfg, B, L, jnp.int8),
        attn_mask=mask)

    tok = jnp.asarray(rng.normal(0, 1, (B, 1, cfg.hidden_size)), jnp.float32)
    for _ in range(4):
        h_f, c_f = gemma2.decode_step(params, cfg, tok, c_f)
        h_q, c_q = gemma2.decode_step(params, cfg, tok, c_q)
        scale = float(np.abs(np.asarray(h_f)).max())
        np.testing.assert_allclose(
            np.asarray(h_q), np.asarray(h_f), atol=0.03 * scale,
            err_msg="int8-KV decode hidden drifted beyond quantization noise")
        np.testing.assert_array_equal(
            np.asarray(c_f.length), np.asarray(c_q.length))
        tok = h_f[:, :1] / 10.0  # feed something state-dependent back


def test_uniform_position_matches_ragged_path():
    """decode_step(position=t) (lockstep rows; dynamic_update_slice cache
    writes) must produce bit-identical hidden states and caches to the
    per-row-scatter path when all rows are at the same position."""
    cfg, params = _tiny()
    B, L = 3, 8
    rng = np.random.default_rng(4)

    for cache_dtype in (jnp.float32, jnp.int8):
        c_ragged = gemma2.KVCache.zeros(cfg, B, L, cache_dtype)
        c_uniform = gemma2.KVCache.zeros(cfg, B, L, cache_dtype)
        for t in range(3):
            tok = jnp.asarray(
                rng.normal(0, 1, (B, 1, cfg.hidden_size)), jnp.float32)
            h_r, c_ragged = gemma2.decode_step(params, cfg, tok, c_ragged)
            h_u, c_uniform = gemma2.decode_step(
                params, cfg, tok, c_uniform, position=jnp.int32(t))
            np.testing.assert_array_equal(np.asarray(h_r), np.asarray(h_u))
            np.testing.assert_array_equal(
                np.asarray(c_ragged.k), np.asarray(c_uniform.k))
            np.testing.assert_array_equal(
                np.asarray(c_ragged.length), np.asarray(c_uniform.length))


def test_uniform_position_contract_checked(monkeypatch):
    """VLM_BRIDGE_DEBUG_CHECKS=1 + checkify catches the documented misuse:
    decode_step(position=...) after a RAGGED prefill (cache.length differs
    per row) — which would otherwise silently overwrite wrong cache slots
    with wrong RoPE positions (advisor finding r2)."""
    from jax.experimental import checkify

    monkeypatch.setenv("VLM_BRIDGE_DEBUG_CHECKS", "1")
    cfg, params = _tiny()
    B, T, L = 2, 4, 8
    rng = np.random.default_rng(5)
    embeds = jnp.asarray(rng.normal(0, 1, (B, T, cfg.hidden_size)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 1], [1, 1, 0, 0]], jnp.int32)  # ragged
    _, cache = gemma2.prefill(
        params, cfg, embeds, gemma2.KVCache.zeros(cfg, B, L, jnp.float32),
        attn_mask=mask)
    tok = jnp.asarray(rng.normal(0, 1, (B, 1, cfg.hidden_size)), jnp.float32)

    checked = checkify.checkify(
        lambda: gemma2.decode_step(params, cfg, tok, cache,
                                   position=jnp.int32(T)))
    err, _ = checked()
    try:
        err.throw()
        raise AssertionError("ragged cache + position= should have failed")
    except checkify.JaxRuntimeError as e:
        assert "lockstep contract" in str(e)

    # the legal lockstep call passes the same check
    uniform = gemma2.KVCache.zeros(cfg, B, L, jnp.float32)
    err, _ = checkify.checkify(
        lambda: gemma2.decode_step(params, cfg, tok, uniform,
                                   position=jnp.int32(0)))()
    err.throw()  # no error


def test_generate_kv_quant_end_to_end():
    cfg = VLMConfig.tiny_test()
    params = full_model.init(jax.random.key(0), cfg, frozen_dtype=jnp.float32)
    B = 2
    pixels = jnp.asarray(
        np.random.default_rng(3).normal(
            0, 1, (B, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    vision = full_model.encode_image(params, cfg, pixels)

    from vlm_bridge_tpu.inference import GenerationConfig, generate_tokens

    N = 8
    toks_f, len_f = generate_tokens(
        params, cfg, vision_features=vision,
        gen=GenerationConfig(max_length=N, greedy=True),
        activation_dtype=jnp.float32)
    toks_q, len_q = generate_tokens(
        params, cfg, vision_features=vision,
        gen=GenerationConfig(max_length=N, greedy=True, kv_quant=True),
        activation_dtype=jnp.float32)
    assert toks_q.shape == (B, N + 1)
    assert (np.asarray(len_q) >= 1).all()
    # greedy argmax is robust to ~0.4% logit noise on a random tiny model
    # only for the earliest steps; require agreement on the first token and
    # valid token ids throughout
    np.testing.assert_array_equal(
        np.asarray(toks_f[:, 1]), np.asarray(toks_q[:, 1]))
    assert (np.asarray(toks_q) >= 0).all()
    assert (np.asarray(toks_q) < cfg.lm.vocab_size).all()
