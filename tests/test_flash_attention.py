"""Flash-attention kernel correctness in Pallas interpret mode (CPU-hermetic).

Covers fwd + custom-VJP bwd against the jnp reference path for: plain MHA,
GQA, causal, logit softcap, sliding window, cross-attention (T != S), and
non-block-aligned shapes. On real TPU hardware the same comparisons run in
compiled mode (see bench/verify notes); interpret mode gives exact f32
numerics so tolerances here are tight.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from vlm_bridge_tpu.ops import flash_attention as fa

fa.INTERPRET = True  # run kernels in the Pallas interpreter on CPU
from vlm_bridge_tpu.ops.attention import _attention_reference


def _mk(B, T, S, H, KH, D, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, S, KH, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, S, KH, D)), jnp.float32)
    return q, k, v


CASES = [
    # name, (B,T,S,H,KH,D), kwargs
    ("mha", (1, 128, 128, 2, 2, 64), {}),
    ("gqa_causal", (2, 128, 128, 4, 2, 64), dict(is_causal=True)),
    ("softcap", (1, 128, 128, 2, 2, 64),
     dict(is_causal=True, logit_softcap=50.0)),
    ("window", (1, 256, 256, 2, 1, 64),
     dict(is_causal=True, logit_softcap=30.0, sliding_window=48)),
    ("cross", (2, 96, 160, 2, 2, 64), {}),
    ("unaligned", (1, 100, 130, 2, 2, 64), dict(is_causal=True)),
]


@pytest.mark.parametrize("name,shape,kwargs", CASES, ids=[c[0] for c in CASES])
def test_forward_and_backward_parity(name, shape, kwargs):
    B, T, S, H, KH, D = shape
    q, k, v = _mk(B, T, S, H, KH, D)
    scale = D ** -0.5
    full_kwargs = dict(is_causal=False, logit_softcap=None,
                       sliding_window=None)
    full_kwargs.update(kwargs)

    out = fa.flash_attention(
        q, k, v, scale=scale, block_q=64, block_k=128, **kwargs)
    ref = _attention_reference(
        q, k, v, scale=scale, mask=None, q_positions=None, kv_positions=None,
        **full_kwargs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)

    def loss_fa(q, k, v):
        o = fa.flash_attention(
            q, k, v, scale=scale, block_q=64, block_k=128, **kwargs)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        o = _attention_reference(
            q, k, v, scale=scale, mask=None, q_positions=None,
            kv_positions=None, **full_kwargs)
        return jnp.sum(jnp.sin(o))

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name_g, a, b in zip(("dq", "dk", "dv"), g_fa, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
            err_msg=f"{name}:{name_g}")


def test_dispatcher_falls_back_on_unsupported():
    q, k, v = _mk(1, 4, 4, 2, 2, 16)  # tiny: unsupported
    out = fa.maybe_flash_attention(
        q, k, v, scale=0.25, mask=None, is_causal=False, logit_softcap=None,
        sliding_window=None, q_positions=None, kv_positions=None)
    assert out is None


@pytest.mark.parametrize("kwargs", [
    {},                                   # bridge-style bidirectional
    dict(is_causal=True, logit_softcap=50.0),            # gemma global layer
    dict(is_causal=True, logit_softcap=50.0, sliding_window=48),  # sliding
], ids=["bidir", "causal_softcap", "sliding"])
def test_kv_lengths_matches_dense_prefix_mask(kwargs):
    """Per-row kv_lengths must equal the jnp path under the equivalent dense
    right-padding mask — the feature that lets padded TRAINING shapes (the
    production case round 1 never dispatched on) use the kernel."""
    B, T, S, H, KH, D = 3, 128, 128, 4, 2, 64
    q, k, v = _mk(B, T, S, H, KH, D, seed=3)
    scale = D ** -0.5
    lengths = jnp.asarray([S, 70, 9], jnp.int32)  # full, ragged, tiny
    dense = (jnp.arange(S)[None, :] < lengths[:, None])[:, None, :]  # [B,1,S]

    full_kwargs = dict(is_causal=False, logit_softcap=None,
                       sliding_window=None)
    full_kwargs.update(kwargs)

    out = fa.flash_attention(
        q, k, v, scale=scale, block_q=64, block_k=64, kv_lengths=lengths,
        **kwargs)
    ref = _attention_reference(
        q, k, v, scale=scale, mask=dense, q_positions=None,
        kv_positions=None, **full_kwargs)
    # rows with zero attendable keys cannot occur (BOS is always valid);
    # compare only query rows the caller would keep (< length for self-attn)
    keep = np.arange(T)[None, :] < np.asarray(lengths)[:, None]
    o, r = np.asarray(out), np.asarray(ref)
    np.testing.assert_allclose(o[keep], r[keep], atol=2e-5, rtol=2e-4)

    def loss_fa(q, k, v):
        o = fa.flash_attention(q, k, v, scale=scale, block_q=64, block_k=64,
                               kv_lengths=lengths, **kwargs)
        return jnp.sum(jnp.sin(o) * keep[..., None, None])

    def loss_ref(q, k, v):
        o = _attention_reference(q, k, v, scale=scale, mask=dense,
                                 q_positions=None, kv_positions=None,
                                 **full_kwargs)
        return jnp.sum(jnp.sin(o) * keep[..., None, None])

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name_g, a, b in zip(("dq", "dk", "dv"), g_fa, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
            err_msg=name_g)


def test_dispatcher_accepts_prefix_mask_with_lengths(monkeypatch):
    """mask + kv_lengths together now dispatch (round 1 returned None for
    every masked shape); mask alone still falls back."""
    monkeypatch.setenv("VLM_BRIDGE_FLASH_MIN_S", "128")
    B, T, S, H, KH, D = 2, 128, 128, 2, 2, 64
    q, k, v = _mk(B, T, S, H, KH, D, seed=4)
    lengths = jnp.asarray([128, 50], jnp.int32)
    dense = (jnp.arange(S)[None, :] < lengths[:, None])[:, None, :]
    out = fa.maybe_flash_attention(
        q, k, v, scale=0.125, mask=dense, is_causal=True, logit_softcap=None,
        sliding_window=None, q_positions=None, kv_positions=None,
        kv_lengths=lengths)
    assert out is not None
    assert fa.maybe_flash_attention(
        q, k, v, scale=0.125, mask=dense, is_causal=True, logit_softcap=None,
        sliding_window=None, q_positions=None, kv_positions=None) is None
