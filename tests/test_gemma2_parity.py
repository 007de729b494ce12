"""Numerics parity: JAX Gemma-2 vs HF transformers (torch CPU), tiny config.

Real-architecture verification without network: both sides run the same
randomly-initialized weights at f32 and must agree to tight tolerance.
Covers: RMSNorm, RoPE, GQA + softcap, sliding/global alternation, GeGLU,
embedding normalizer, tied lm_head + final softcap, KV-cache decode.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import Gemma2Config
from vlm_bridge_tpu.models import gemma2
from vlm_bridge_tpu.params.hf_loader import gemma2_from_state_dict

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Gemma2Config as HFConfig
    from transformers.models.gemma2.modeling_gemma2 import Gemma2ForCausalLM

    cfg = Gemma2Config.tiny_test()
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        query_pre_attn_scalar=cfg.query_pre_attn_scalar,
        sliding_window=cfg.sliding_window,
        max_position_embeddings=cfg.max_position_embeddings,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Gemma2ForCausalLM(hf_cfg).eval()
    return cfg, model


@pytest.fixture(scope="module")
def jax_params(hf_model):
    cfg, model = hf_model
    return gemma2_from_state_dict(model.state_dict(), cfg, dtype=jnp.float32)


def test_forward_logits_parity(hf_model, jax_params):
    cfg, model = hf_model
    B, T = 2, 24  # > sliding_window=8 so window masking is exercised
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, (B, T))

    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids)).logits.numpy()

    mine = gemma2.forward(
        jax_params, cfg, input_ids=jnp.asarray(ids),
        attn_mask=jnp.ones((B, T), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(mine), ref, atol=3e-4, rtol=3e-3)


def test_padding_mask_parity(hf_model, jax_params):
    cfg, model = hf_model
    B, T = 2, 12
    rng = np.random.default_rng(2)
    ids = rng.integers(3, cfg.vocab_size, (B, T))
    mask = np.ones((B, T), np.int64)
    mask[0, 9:] = 0  # right padding
    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).logits.numpy()
    mine = np.asarray(gemma2.forward(
        jax_params, cfg, input_ids=jnp.asarray(ids),
        attn_mask=jnp.asarray(mask),
    ))
    # Only compare non-pad positions (HF computes garbage at pads too,
    # but query-side values at pads are allowed to differ).
    np.testing.assert_allclose(mine[:, :9], ref[:, :9], atol=3e-4, rtol=3e-3)


def test_inputs_embeds_parity(hf_model, jax_params):
    """The bridge feeds the LM via inputs_embeds — verify that path
    (reference forward_from_embeddings, language_model.py:111-144)."""
    cfg, model = hf_model
    B, T = 2, 10
    rng = np.random.default_rng(3)
    embeds = rng.normal(0, 0.05, (B, T, cfg.hidden_size)).astype(np.float32)
    with torch.no_grad():
        ref = model(inputs_embeds=torch.from_numpy(embeds)).logits.numpy()
    mine = np.asarray(gemma2.forward(
        jax_params, cfg, inputs_embeds=jnp.asarray(embeds),
        attn_mask=jnp.ones((B, T), jnp.int32),
    ))
    np.testing.assert_allclose(mine, ref, atol=3e-4, rtol=3e-3)


def test_remat_matches_no_remat(hf_model, jax_params):
    cfg, _ = hf_model
    B, T = 2, 16
    ids = np.random.default_rng(4).integers(0, cfg.vocab_size, (B, T))
    a = gemma2.forward(jax_params, cfg, input_ids=jnp.asarray(ids),
                       attn_mask=jnp.ones((B, T), jnp.int32), remat=False)
    b = gemma2.forward(jax_params, cfg, input_ids=jnp.asarray(ids),
                       attn_mask=jnp.ones((B, T), jnp.int32), remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_kv_cache_decode_matches_full_forward(hf_model, jax_params):
    """Prefill + single-token decode must reproduce the full forward logits
    position by position (this replaces the reference's no-KV-cache loop,
    full_model.py:241-373, with identical numerics)."""
    cfg, _ = hf_model
    B, T = 2, 20  # crosses the sliding window boundary (8)
    ids = np.random.default_rng(5).integers(0, cfg.vocab_size, (B, T))
    ids_j = jnp.asarray(ids)

    full = gemma2.forward(
        jax_params, cfg, input_ids=ids_j, attn_mask=jnp.ones((B, T), jnp.int32))

    prompt_len = 5
    cache = gemma2.KVCache.zeros(cfg, B, max_len=32, dtype=jnp.float32)
    embeds = gemma2.embed(jax_params, ids_j[:, :prompt_len])
    hidden, cache = gemma2.prefill(jax_params, cfg, embeds, cache)
    logits_pf = gemma2.logits_from_hidden(jax_params, cfg, hidden)
    np.testing.assert_allclose(
        np.asarray(logits_pf), np.asarray(full[:, :prompt_len]),
        atol=2e-4, rtol=2e-3)

    for t in range(prompt_len, T):
        tok = gemma2.embed(jax_params, ids_j[:, t:t + 1])
        hidden, cache = gemma2.decode_step(jax_params, cfg, tok, cache)
        step_logits = gemma2.logits_from_hidden(jax_params, cfg, hidden)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full[:, t]),
            atol=2e-4, rtol=2e-3, err_msg=f"position {t}")


@pytest.mark.slow
def test_padded_prefill_decode_matches_unpadded(hf_model, jax_params):
    """Ragged prompts: a right-padded batch prefill + decode must produce the
    same logits per row as running each row unpadded (pads unattendable,
    per-row decode positions)."""
    cfg, _ = hf_model
    lens = [5, 9]
    T = max(lens)
    B = len(lens)
    rng = np.random.default_rng(7)
    ids = rng.integers(3, cfg.vocab_size, (B, T)).astype(np.int32)
    mask = np.zeros((B, T), np.int32)
    for b, n in enumerate(lens):
        mask[b, :n] = 1
        ids[b, n:] = 0

    # padded batch: prefill + 3 decode steps of a shared continuation token
    cache = gemma2.KVCache.zeros(cfg, B, max_len=32, dtype=jnp.float32)
    embeds = gemma2.embed(jax_params, jnp.asarray(ids))
    _, cache = gemma2.prefill(jax_params, cfg, embeds, cache,
                              attn_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(cache.length), lens)
    cont = rng.integers(3, cfg.vocab_size, (3,)).astype(np.int32)
    batch_logits = []
    for t in cont:
        tok = gemma2.embed(jax_params, jnp.full((B, 1), int(t), jnp.int32))
        hidden, cache = gemma2.decode_step(jax_params, cfg, tok, cache)
        batch_logits.append(np.asarray(
            gemma2.logits_from_hidden(jax_params, cfg, hidden))[:, 0])

    # oracle: each row alone, unpadded
    for b, n in enumerate(lens):
        cache1 = gemma2.KVCache.zeros(cfg, 1, max_len=32, dtype=jnp.float32)
        e1 = gemma2.embed(jax_params, jnp.asarray(ids[b:b + 1, :n]))
        _, cache1 = gemma2.prefill(jax_params, cfg, e1, cache1)
        for step, t in enumerate(cont):
            tok = gemma2.embed(jax_params, jnp.full((1, 1), int(t), jnp.int32))
            hidden, cache1 = gemma2.decode_step(jax_params, cfg, tok, cache1)
            want = np.asarray(
                gemma2.logits_from_hidden(jax_params, cfg, hidden))[0, 0]
            np.testing.assert_allclose(
                batch_logits[step][b], want, atol=2e-4, rtol=2e-3,
                err_msg=f"row {b} step {step}")
