"""Int8 weight-only quantization tests: kernels (interpret mode), fallback
parity, quantized Gemma-2 forward/decode accuracy (SURVEY has no reference
analogue — this is the serving-path optimization on top of parity)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import Gemma2Config, VLMConfig
from vlm_bridge_tpu.models import full_model, gemma2
from vlm_bridge_tpu.ops import quant
from vlm_bridge_tpu.ops.quant import (
    dequantize, int8_matmul, int8_matmul_t, quantize_int8)


def test_quantize_roundtrip_error():
    w = np.random.default_rng(0).normal(0, 0.04, (96, 160)).astype(np.float32)
    wq = quantize_int8(jnp.asarray(w), axis=0)
    assert wq["w_int8"].dtype == jnp.int8
    assert wq["scale"].shape == (160,)
    back = np.asarray(dequantize(wq, axis=0))
    # symmetric 127-level rounding: error <= scale/2 per element
    bound = np.asarray(wq["scale"])[None, :] * 0.5 + 1e-8
    assert (np.abs(back - w) <= bound).all()


def test_int8_matmul_fallback_matches_dequant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (5, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (96, 160)), jnp.float32)
    wq = quantize_int8(w, axis=0)
    got = np.asarray(int8_matmul(x, wq))
    want = np.asarray(x @ dequantize(wq, axis=0))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def _bf16(x):
    """Kernels round activations to bf16 (the production dtype; int8 weights
    are exact in bf16) — references must round identically."""
    return jnp.asarray(x, jnp.bfloat16).astype(jnp.float32)


def test_int8_matmul_kernel_interpret():
    quant.INTERPRET = True
    try:
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 1, (5, 200)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.05, (200, 300)), jnp.float32)
        wq = quantize_int8(w, axis=0)
        got = np.asarray(int8_matmul(x, wq, block_i=64, block_o=128))
        want = np.asarray(_bf16(x) @ dequantize(wq, axis=0))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)
    finally:
        quant.INTERPRET = False


def test_int8_matmul_t_kernel_interpret():
    quant.INTERPRET = True
    try:
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(0, 1, (4, 72)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.05, (500, 72)), jnp.float32)
        wq = quantize_int8(w, axis=1)
        got = np.asarray(int8_matmul_t(x, wq, block_v=128))
        want = np.asarray(
            _bf16(x) @ dequantize(wq, axis=1).T)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)
    finally:
        quant.INTERPRET = False


@pytest.fixture(scope="module")
def lm_pair():
    cfg = Gemma2Config.tiny_test()
    params = gemma2.init(jax.random.key(0), cfg, dtype=jnp.float32)
    return cfg, params, gemma2.quantize_params(params)


def test_quantized_embed_lookup(lm_pair):
    cfg, params, qparams = lm_pair
    ids = jnp.asarray([[1, 5, 100], [7, 0, 3]], jnp.int32)
    full = np.asarray(gemma2.embed(params, ids))
    q = np.asarray(gemma2.embed(qparams, ids)).astype(np.float32)
    # bf16 rows * bf16 scales: tolerance dominated by bf16, then int8
    np.testing.assert_allclose(q, full, atol=3e-3, rtol=3e-2)


def test_quantized_forward_close(lm_pair):
    cfg, params, qparams = lm_pair
    B, T = 2, 12
    ids = jnp.asarray(
        np.random.default_rng(4).integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    full = np.asarray(gemma2.forward(params, cfg, input_ids=ids, attn_mask=mask))
    q = np.asarray(gemma2.forward(qparams, cfg, input_ids=ids, attn_mask=mask))
    # logits live in ~[-30, 30] (softcap); int8 weight error shifts them a
    # little but the distribution must stay aligned
    assert np.abs(q - full).mean() < 0.15
    top_full = full.argmax(-1)
    top_q = q.argmax(-1)
    assert (top_full == top_q).mean() > 0.8


@pytest.mark.slow
def test_quantized_generation_runs(lm_pair):
    """End-to-end fast decode with a quantized LM (bridge/vision stay bf16)."""
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)

    cfg = VLMConfig.tiny_test()
    params = full_model.init(jax.random.key(0), cfg, frozen_dtype=jnp.float32)
    qparams = dict(params)
    qparams["lm"] = gemma2.quantize_params(params["lm"])
    vision = full_model.encode_image(params, cfg, jnp.zeros(
        (1, cfg.image_size, cfg.image_size, 3), jnp.float32))
    toks_q, _ = generate_tokens(
        params=qparams, cfg=cfg, vision_features=vision,
        gen=GenerationConfig(max_length=6, greedy=True),
        activation_dtype=jnp.float32)
    toks_f, _ = generate_tokens(
        params=params, cfg=cfg, vision_features=vision,
        gen=GenerationConfig(max_length=6, greedy=True),
        activation_dtype=jnp.float32)
    toks_q, toks_f = np.asarray(toks_q), np.asarray(toks_f)
    assert toks_q.shape == toks_f.shape
    # greedy streams usually agree on the first token at least
    assert toks_q[0, 0] == toks_f[0, 0] == cfg.lm.bos_token_id


def test_int8_mlp_fused_matches_unfused():
    from vlm_bridge_tpu.ops.quant import int8_mlp

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (4, 64)), jnp.float32)
    gate = quantize_int8(jnp.asarray(rng.normal(0, 0.1, (64, 128)), jnp.float32), axis=0)
    up = quantize_int8(jnp.asarray(rng.normal(0, 0.1, (64, 128)), jnp.float32), axis=0)
    down = quantize_int8(jnp.asarray(rng.normal(0, 0.1, (128, 64)), jnp.float32), axis=0)

    def ref(x):
        g = x @ dequantize(gate, axis=0)
        u = x @ dequantize(up, axis=0)
        h = jax.nn.gelu(g, approximate=True) * u
        return h @ dequantize(down, axis=0)

    got = np.asarray(int8_mlp(x, gate, up, down))
    np.testing.assert_allclose(got, np.asarray(ref(x)), atol=2e-4, rtol=2e-3)

    quant.INTERPRET = True
    try:
        # kernel rounds x and the gelu(g)*u intermediate to bf16
        got_k = np.asarray(int8_mlp(x, gate, up, down, block_f=64))
        np.testing.assert_allclose(
            got_k, np.asarray(ref(_bf16(x))), atol=5e-3, rtol=2e-2)
    finally:
        quant.INTERPRET = False


def test_int8_ffn_fused_matches_unfused():
    from vlm_bridge_tpu.ops.quant import int8_ffn

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1, (4, 64)), jnp.float32)
    fc1 = quantize_int8(jnp.asarray(rng.normal(0, 0.1, (64, 128)), jnp.float32), axis=0)
    fc2 = quantize_int8(jnp.asarray(rng.normal(0, 0.1, (128, 64)), jnp.float32), axis=0)
    b1 = jnp.asarray(rng.normal(0, 0.05, (128,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.05, (64,)), jnp.float32)

    def ref(x):
        g = x @ dequantize(fc1, axis=0) + b1
        h = jax.nn.gelu(g, approximate=False)  # exact GELU (bridge FFN)
        return h @ dequantize(fc2, axis=0) + b2

    got = np.asarray(int8_ffn(x, fc1, b1, fc2, b2))
    np.testing.assert_allclose(got, np.asarray(ref(x)), atol=2e-4, rtol=2e-3)

    quant.INTERPRET = True
    try:
        got_k = np.asarray(int8_ffn(x, fc1, b1, fc2, b2, block_f=64))
        np.testing.assert_allclose(
            got_k, np.asarray(ref(_bf16(x))), atol=5e-3, rtol=2e-2)
    finally:
        quant.INTERPRET = False


def test_quantized_bridge_decode_close():
    """Fast decode with an int8 bridge (fused self-qkv + fused FFN) stays
    within quantization noise of the f32-bridge decode and agrees on the
    first greedy token."""
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)
    from vlm_bridge_tpu.models import bridge

    cfg = VLMConfig.tiny_test()
    params = full_model.init(jax.random.key(0), cfg, frozen_dtype=jnp.float32)
    qparams = dict(params)
    qparams["bridge"] = bridge.quantize_decode_params(params["bridge"])
    # structural checks: fused qkv present, cross k/v left unquantized
    b0 = qparams["bridge"]["blocks"]["0"]
    assert isinstance(b0["self"]["qkv"], dict)
    assert "q" not in b0["self"]
    assert not isinstance(b0["cross"]["k"], dict)
    assert isinstance(b0["ffn"]["fc1"], dict)

    vision = full_model.encode_image(params, cfg, jnp.asarray(
        np.random.default_rng(11).normal(
            0, 1, (2, cfg.image_size, cfg.image_size, 3)), jnp.float32))
    gen = GenerationConfig(max_length=6, greedy=True)
    toks_f, _ = generate_tokens(params=params, cfg=cfg,
                                vision_features=vision, gen=gen,
                                activation_dtype=jnp.float32)
    toks_q, _ = generate_tokens(params=qparams, cfg=cfg,
                                vision_features=vision, gen=gen,
                                activation_dtype=jnp.float32)
    toks_f, toks_q = np.asarray(toks_f), np.asarray(toks_q)
    assert toks_q.shape == toks_f.shape
    np.testing.assert_array_equal(toks_f[:, 1], toks_q[:, 1])


def test_quantize_parts_selective(lm_pair):
    cfg, params, _ = lm_pair
    q = gemma2.quantize_params(params, parts=("embedding", "mlp"))
    lp = q["layers"]["0"]
    assert isinstance(lp["mlp"]["gate"], dict)
    assert not isinstance(lp["attn"]["q"], dict)   # attn left bf16
    assert isinstance(q["embedding"], dict)
    B, T = 1, 6
    ids = jnp.asarray(
        np.random.default_rng(9).integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    full = np.asarray(gemma2.forward(params, cfg, input_ids=ids,
                                     attn_mask=jnp.ones((B, T), jnp.int32)))
    part = np.asarray(gemma2.forward(q, cfg, input_ids=ids,
                                     attn_mask=jnp.ones((B, T), jnp.int32)))
    assert np.abs(part - full).mean() < 0.15


def test_int8_greedy_token_agreement_over_images():
    """End-to-end quality bound for the full serving recipe (int8 LM +
    int8 bridge + int8 KV cache): greedy tokens over a batch of images must
    agree with the f32 model above a threshold. Random-init tiny weights are
    the WORST case for this (near-flat logits flip argmaxes on tiny noise);
    real trained weights are sharper."""
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)
    from vlm_bridge_tpu.models import bridge as bridge_mod

    cfg = VLMConfig.tiny_test()
    params = full_model.init(jax.random.key(2), cfg, frozen_dtype=jnp.float32)
    qparams = dict(params)
    qparams["lm"] = gemma2.quantize_params(params["lm"])
    qparams["bridge"] = bridge_mod.quantize_decode_params(params["bridge"])

    N, T = 8, 8
    pixels = jnp.asarray(
        np.random.default_rng(7).normal(0, 1, (N, cfg.image_size,
                                                cfg.image_size, 3)),
        jnp.float32)
    vision = full_model.encode_image(params, cfg, pixels)
    toks_f, len_f = generate_tokens(
        params=params, cfg=cfg, vision_features=vision,
        gen=GenerationConfig(max_length=T, greedy=True),
        activation_dtype=jnp.float32)
    toks_q, len_q = generate_tokens(
        params=qparams, cfg=cfg, vision_features=vision,
        gen=GenerationConfig(max_length=T, greedy=True, kv_quant=True),
        activation_dtype=jnp.float32)
    toks_f, toks_q = np.asarray(toks_f), np.asarray(toks_q)

    # compare only positions both streams consider live (post-EOS is pad)
    live = np.minimum(np.asarray(len_f), np.asarray(len_q))
    agree = total = 0
    for b in range(N):
        n = int(live[b]) + 1
        agree += (toks_f[b, :n] == toks_q[b, :n]).sum()
        total += n
    assert total >= N  # at least BOS+1 per row
    assert agree / total >= 0.75, (
        f"int8 greedy agreement {agree}/{total} below bound; "
        f"f32={toks_f.tolist()} q={toks_q.tolist()}")


def test_per_layer_logit_error_real_dims():
    """Per-layer error bound at REAL Gemma-2-2B dims (2304/9216, 8 heads /
    4 KV heads): one decoder layer, int8-quantized (fused qkv + mlp), must
    track the f32 layer within tight relative error. This is the measured
    error bar behind 'dequant is lossless; rounding is ~0.2%'."""
    cfg = Gemma2Config(
        vocab_size=512, hidden_size=2304, intermediate_size=9216,
        num_layers=1, num_heads=8, num_kv_heads=4, head_dim=256)
    params = gemma2.init(jax.random.key(5), cfg, dtype=jnp.float32)
    qparams = gemma2.quantize_params(params, parts=("mlp", "attn"))

    B, T = 2, 6
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(0, 1, (B, T, cfg.hidden_size)), jnp.float32)
    h_f = np.asarray(gemma2.forward_hidden(params, cfg, x))
    h_q = np.asarray(gemma2.forward_hidden(qparams, cfg, x))
    rel = np.linalg.norm(h_q - h_f) / np.linalg.norm(h_f)
    assert rel < 2e-2, f"relative L2 error {rel:.4f} at real dims"
    # per-position worst case stays bounded too
    per_tok = (np.linalg.norm((h_q - h_f).reshape(B * T, -1), axis=-1)
               / np.linalg.norm(h_f.reshape(B * T, -1), axis=-1))
    assert per_tok.max() < 5e-2


def test_int8_matmul_t_argmax_kernel_interpret(monkeypatch):
    monkeypatch.setattr(quant, "INTERPRET", True)
    rng = np.random.default_rng(11)
    M, H, V = 8, 128, 1000  # V not a multiple of block -> pad masking path
    x = jnp.asarray(rng.normal(0, 1, (M, H)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (V, H)), jnp.float32)
    wq = quantize_int8(w, axis=1)
    got = np.asarray(quant.int8_matmul_t_argmax(x, wq, block_v=256))
    want = np.asarray(jnp.argmax(int8_matmul_t(x, wq), axis=-1))
    np.testing.assert_array_equal(got, want)
    # all-NaN row matches the sanitize->zeros->argmax convention (index 0)
    x_nan = x.at[2].set(jnp.nan)
    got_nan = np.asarray(quant.int8_matmul_t_argmax(x_nan, wq, block_v=256))
    assert got_nan[2] == 0


# ---------------------------------------------------------------------------
# Int4 nibble packing (probe stage — scripts/int4_mlp_probe.py decides
# on-chip acceptance)
# ---------------------------------------------------------------------------


def test_int4_pack_roundtrip():
    from vlm_bridge_tpu.ops import quant as q4

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(0, 0.1, (64, 32)), jnp.float32)
    wq = q4.quantize_int4(w, axis=0)
    assert wq["w_int4"].shape == (32, 32) and wq["w_int4"].dtype == jnp.int8
    deq = q4.dequantize_int4(wq, axis=0)
    # symmetric 4-bit: per-element error <= scale/2
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(wq["scale"])[None, :] / 2 + 1e-7).all()
    # unpack really inverts the packing
    lo, hi = q4.unpack_int4(wq["w_int4"])
    assert int(np.abs(np.asarray(lo)).max()) <= 7
    assert int(np.abs(np.asarray(hi)).max()) <= 7


def test_int4_blockwise_repack_consistent():
    from vlm_bridge_tpu.ops import quant as q4

    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.normal(0, 0.1, (1024, 64)), jnp.float32)
    wq = q4.quantize_int4(w, axis=0)
    blk = q4.repack_down_blockwise(wq, block_f=512)
    np.testing.assert_array_equal(
        np.asarray(q4.dequantize_int4(wq, axis=0)),
        np.asarray(q4.dequantize_int4_blockwise(blk, block_f=512)))


def test_int4_mlp_fallback_and_kernel_match():
    from vlm_bridge_tpu.ops import quant as q4

    rng = np.random.default_rng(9)
    H, F, block_f = 256, 2048, 512
    x = jnp.asarray(rng.normal(0, 1, (4, H)), jnp.float32)
    gate = q4.quantize_int4(
        jnp.asarray(rng.normal(0, 0.1, (H, F)), jnp.float32), axis=0)
    up = q4.quantize_int4(
        jnp.asarray(rng.normal(0, 0.1, (H, F)), jnp.float32), axis=0)
    down = q4.repack_down_blockwise(q4.quantize_int4(
        jnp.asarray(rng.normal(0, 0.1, (F, H)), jnp.float32), axis=0),
        block_f=block_f)

    def ref(x, round_h=False):
        g = x @ q4.dequantize_int4(gate, axis=0)
        u = x @ q4.dequantize_int4(up, axis=0)
        h = jax.nn.gelu(g, approximate=True) * u
        if round_h:  # the kernel keeps the [M, F] intermediate in bf16
            h = _bf16(h)
        return h @ q4.dequantize_int4_blockwise(down, block_f=block_f)

    got = np.asarray(q4.int4_mlp(x, gate, up, down, block_f=block_f))
    np.testing.assert_allclose(got, np.asarray(ref(x)), atol=2e-4, rtol=2e-3)

    quant.INTERPRET = True
    try:
        got_k = np.asarray(q4.int4_mlp(x, gate, up, down, block_f=block_f))
        np.testing.assert_allclose(
            got_k, np.asarray(ref(_bf16(x), round_h=True)),
            atol=5e-3, rtol=2e-2)
    finally:
        quant.INTERPRET = False


def test_int4_groupwise_roundtrip_and_scale_shape():
    from vlm_bridge_tpu.ops import quant as q4

    rng = np.random.default_rng(12)
    K, N, g = 256, 64, 32
    w = jnp.asarray(rng.normal(0, 0.1, (K, N)), jnp.float32)
    wq = q4.quantize_int4(w, axis=0, group_size=g)
    assert wq["scale"].shape == (K // g, N)
    assert wq["group_size"] == g
    deq = np.asarray(q4.dequantize_int4(wq, axis=0))
    # per-element error <= that element's GROUP scale / 2
    srows = np.repeat(np.asarray(wq["scale"]), g, axis=0)
    assert (np.abs(deq - np.asarray(w)) <= srows / 2 + 1e-7).all()


def test_int4_groupwise_contains_outliers():
    """The reason group-wise exists: one outlier weight inflates the whole
    column's scale per-channel, but only its own group's with group_size.
    This is the offline stand-in for the real-weight quality check (Gemma-2
    MLP weights have per-channel outliers, like every trained LLM)."""
    from vlm_bridge_tpu.ops import quant as q4

    rng = np.random.default_rng(13)
    K, N = 512, 128
    w = rng.normal(0, 0.02, (K, N)).astype(np.float32)
    w[7, :] += np.sign(rng.normal(size=N)) * 0.4  # 20-sigma outlier row
    wj = jnp.asarray(w)

    def rel_err(wq):
        d = np.asarray(q4.dequantize_int4(wq, axis=0))
        return np.linalg.norm(d - w) / np.linalg.norm(w)

    e_chan = rel_err(q4.quantize_int4(wj, axis=0))
    e_grp = rel_err(q4.quantize_int4(wj, axis=0, group_size=64))
    # outlier sits in one 64-row group: 7/8 of rows quantize at the clean
    # scale, so the error must drop by a large factor, not a rounding hair
    assert e_grp < 0.5 * e_chan, (e_chan, e_grp)


def test_int4_groupwise_blockwise_repack_consistent():
    from vlm_bridge_tpu.ops import quant as q4

    rng = np.random.default_rng(14)
    w = jnp.asarray(rng.normal(0, 0.1, (1024, 64)), jnp.float32)
    wq = q4.quantize_int4(w, axis=0, group_size=128)
    blk = q4.repack_down_blockwise(wq, block_f=512)
    assert blk["group_size"] == 128
    np.testing.assert_array_equal(
        np.asarray(q4.dequantize_int4(wq, axis=0)),
        np.asarray(q4.dequantize_int4_blockwise(blk, block_f=512)))


@pytest.mark.parametrize("group", [64, 128])
def test_int4_mlp_groupwise_fallback_and_kernel_match(group):
    from vlm_bridge_tpu.ops import quant as q4

    rng = np.random.default_rng(15)
    H, F, block_f = 256, 2048, 512
    x = jnp.asarray(rng.normal(0, 1, (4, H)), jnp.float32)
    gate = q4.quantize_int4(
        jnp.asarray(rng.normal(0, 0.1, (H, F)), jnp.float32),
        axis=0, group_size=group)
    up = q4.quantize_int4(
        jnp.asarray(rng.normal(0, 0.1, (H, F)), jnp.float32),
        axis=0, group_size=group)
    down = q4.repack_down_blockwise(q4.quantize_int4(
        jnp.asarray(rng.normal(0, 0.1, (F, H)), jnp.float32),
        axis=0, group_size=group), block_f=block_f)

    def ref(x, round_h=False):
        g = x @ q4.dequantize_int4(gate, axis=0)
        u = x @ q4.dequantize_int4(up, axis=0)
        h = jax.nn.gelu(g, approximate=True) * u
        if round_h:
            h = _bf16(h)
        return h @ q4.dequantize_int4_blockwise(down, block_f=block_f)

    got = np.asarray(q4.int4_mlp(x, gate, up, down, block_f=block_f))
    np.testing.assert_allclose(got, np.asarray(ref(x)), atol=2e-4, rtol=2e-3)

    quant.INTERPRET = True
    try:
        got_k = np.asarray(q4.int4_mlp(x, gate, up, down, block_f=block_f))
        np.testing.assert_allclose(
            got_k, np.asarray(ref(_bf16(x), round_h=True)),
            atol=5e-3, rtol=2e-2)
    finally:
        quant.INTERPRET = False


def test_int4_mlp_rejects_mixed_group_sizes():
    from vlm_bridge_tpu.ops import quant as q4

    rng = np.random.default_rng(16)
    H, F, block_f = 256, 2048, 512
    x = jnp.asarray(rng.normal(0, 1, (4, H)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (H, F)), jnp.float32)
    gate = q4.quantize_int4(w, axis=0, group_size=128)
    up = q4.quantize_int4(w, axis=0)  # per-channel — mismatched
    down = q4.repack_down_blockwise(q4.quantize_int4(
        jnp.asarray(rng.normal(0, 0.1, (F, H)), jnp.float32),
        axis=0, group_size=128), block_f=block_f)
    with pytest.raises(AssertionError, match="group_size"):
        q4.int4_mlp(x, gate, up, down, block_f=block_f)


# ---------------------------------------------------------------------------
# Int4 rows-packed embedding / lm_head (greedy-head stream at 4 bits)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("group", [None, 128])
def test_int4_rows_roundtrip_and_gather(group):
    rng = np.random.default_rng(21)
    V, H = 200, 256
    w = jnp.asarray(rng.normal(0, 0.05, (V, H)), jnp.float32)
    wq = quant.quantize_int4_rows(w, group_size=group)
    assert wq["w_int4"].shape == (V, H // 2)
    if group is None:
        assert wq["scale"].shape == (V,)
    else:
        assert wq["scale"].shape == (H // group, V)  # transposed for lanes
    deq = np.asarray(quant.dequantize_int4_rows(wq))
    rel = np.abs(deq - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.12  # int4 grid: |err| <= scale/2 <= absmax/14

    ids = jnp.asarray([0, 3, 199, 3])
    rows = np.asarray(quant.take_int4_rows(wq, ids))
    np.testing.assert_allclose(rows, deq[np.asarray(ids)], rtol=1e-6)


@pytest.mark.parametrize("group", [None, 128])
def test_int4_matmul_t_kernel_interpret(monkeypatch, group):
    monkeypatch.setattr(quant, "INTERPRET", True)
    rng = np.random.default_rng(23)
    M, H, V = 8, 512, 300  # V % block != 0 -> padding path
    x = jnp.asarray(rng.normal(0, 1, (M, H)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (V, H)), jnp.float32)
    wq = quant.quantize_int4_rows(w, group_size=group)
    assert quant._int4_mmt_pallas_ok(wq)
    got = np.asarray(quant.int4_matmul_t(x, wq))
    want = np.asarray(x) @ np.asarray(
        quant.dequantize_int4_rows(wq)).T  # exact int4 grid reference
    np.testing.assert_allclose(got, want, atol=3e-2 * np.abs(want).max())


@pytest.mark.parametrize("group", [None, 128])
def test_int4_matmul_t_argmax_kernel_interpret(monkeypatch, group):
    monkeypatch.setattr(quant, "INTERPRET", True)
    rng = np.random.default_rng(29)
    M, H, V = 8, 512, 1000
    x = jnp.asarray(rng.normal(0, 1, (M, H)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (V, H)), jnp.float32)
    wq = quant.quantize_int4_rows(w, group_size=group)
    got = np.asarray(quant.int4_matmul_t_argmax(x, wq, block_v=256))
    want = np.asarray(jnp.argmax(quant.int4_matmul_t(x, wq), axis=-1))
    np.testing.assert_array_equal(got, want)
    x_nan = x.at[2].set(jnp.nan)
    got_nan = np.asarray(quant.int4_matmul_t_argmax(x_nan, wq, block_v=256))
    assert got_nan[2] == 0


def test_int4_rows_small_h_falls_back():
    # tiny dims (H=64) cannot lane-align the nibble halves: the public
    # entry points must serve via the jnp fallback, not crash
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(0, 1, (4, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (96, 64)), jnp.float32)
    wq = quant.quantize_int4_rows(w)
    assert not quant._int4_mmt_pallas_ok(wq)
    got = np.asarray(quant.int4_matmul_t(x, wq))
    want = np.asarray(x) @ np.asarray(quant.dequantize_int4_rows(wq)).T
    np.testing.assert_allclose(got, want, atol=1e-4 * np.abs(want).max())
    idx = np.asarray(quant.int4_matmul_t_argmax(x, wq))
    np.testing.assert_array_equal(idx, np.argmax(want, axis=-1))


def test_embedding4_quantize_parts_and_paths():
    """quantize_params(parts with embedding4) plugs into embed,
    logits_from_hidden and the greedy generate head transparently."""
    cfg = Gemma2Config.tiny_test()
    params = gemma2.init(jax.random.key(0), cfg, dtype=jnp.float32)
    q4 = gemma2.quantize_params(params, parts=("embedding4", "mlp", "attn"))
    assert "w_int4" in q4["embedding"]
    with pytest.raises(ValueError):
        gemma2.quantize_params(params, parts=("embedding", "embedding4"))

    # reference: the same model with the embedding replaced by the EXACT
    # dequantized int4 table (raw array path)
    ref = dict(q4, embedding=quant.dequantize_int4_rows(q4["embedding"]))
    ids = jnp.asarray([[1, 5, 77], [3, 0, 511]])
    np.testing.assert_allclose(
        np.asarray(gemma2.embed(q4, ids)),
        np.asarray(gemma2.embed(ref, ids)), rtol=1e-6)

    hidden = jnp.asarray(
        np.random.default_rng(33).normal(0, 1, (2, 3, cfg.hidden_size)),
        jnp.float32)
    lg4 = np.asarray(gemma2.logits_from_hidden(q4, cfg, hidden))
    lgr = np.asarray(gemma2.logits_from_hidden(ref, cfg, hidden))
    np.testing.assert_allclose(lg4, lgr, atol=2e-5 * np.abs(lgr).max())


def test_generate_greedy_embedding4_runs():
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)

    cfg = VLMConfig.tiny_test()
    params = full_model.init(jax.random.key(0), cfg)
    params["lm"] = gemma2.quantize_params(
        params["lm"], parts=("embedding4", "mlp", "attn"))
    rng = np.random.default_rng(35)
    pixels = jnp.asarray(
        rng.normal(0, 1, (2, cfg.image_size, cfg.image_size, 3)),
        jnp.float32)
    gen = GenerationConfig(max_length=6, greedy=True, kv_quant=True)
    toks, lengths = generate_tokens(params, cfg, pixel_values=pixels,
                                    gen=gen)
    assert toks.shape == (2, 7) and np.asarray(lengths).shape == (2,)


def test_unpack_int4_emits_no_int8_vector_ops():
    """v5e Mosaic legalizes NEITHER comparisons (arith.cmpi) NOR shifts
    (arith.shli/shrsi) on vector<...xi8> — all three refusals were captured
    live from the remote compiler in round 5, and interpret mode accepts
    them silently, so only this jaxpr-level guard can catch a regression
    off-chip: every shift/compare inside unpack_int4 must operate on a
    widened (>= 32-bit) dtype."""
    import jax

    packed = jnp.zeros((8, 128), jnp.int8)
    jaxpr = jax.make_jaxpr(quant.unpack_int4)(packed)
    banned = {"shift_left", "shift_right_arithmetic", "shift_right_logical",
              "ge", "gt", "le", "lt", "eq", "ne", "select_n"}
    for eqn in jaxpr.jaxpr.eqns:
        if eqn.primitive.name not in banned:
            continue
        for v in eqn.invars:
            dt = getattr(getattr(v, "aval", None), "dtype", None)
            assert dt is None or jnp.dtype(dt).itemsize >= 4, (
                f"{eqn.primitive.name} on {dt} inside unpack_int4 — "
                f"sub-32-bit vector shifts/compares do not compile on "
                f"v5e Mosaic (see unpack_int4 docstring)")
