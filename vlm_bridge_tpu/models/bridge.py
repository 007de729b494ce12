"""Bridge-Lite adapter: the trainable cross-attention stack, pure JAX.

Weight-compatible re-design of the reference Bridge-Lite
(reference: src/vlm_bridge/model_architecture/bridge_module.py:240-471):

per block (all pre-LN with residuals):
  1. cross-attention — text queries [*, language_dim], vision keys/values
     [*, vision_dim], internal d_model = language_dim, 8 heads; the w_k/w_v
     projections perform the 1024 -> 2304 dimension alignment (there is no
     separate vision-projection layer)
  2. non-causal self-attention over text, 18 heads
  3. FFN: language_dim -> 4x -> language_dim with exact GELU

Init matches the reference: Xavier-uniform weights, zero biases, LN ones/zeros
(bridge_module.py:394-404).

Dropout is supported for training (`rng` + `train=True`); evaluation is
deterministic. Sites: each attention OUTPUT and the FFN post-GELU/output
(reference sites: SDPA attention probs + FFN, bridge_module.py:137, 291-297
— prob-dropout is incompatible with flash kernels that never materialize
the probability matrix, so attention dropout is applied to the attention
output instead; same expected scale, standard flash-attention substitute).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import BridgeConfig
from vlm_bridge_tpu.ops.attention import dot_product_attention
from vlm_bridge_tpu.ops.layers import gelu_exact, layer_norm, linear


def _xavier(key, fan_in, fan_out, dtype):
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, (fan_in, fan_out), jnp.float32, -bound, bound).astype(dtype)


def init(rng: jax.Array, cfg: BridgeConfig, dtype=jnp.float32) -> dict:
    """Trainable params default to f32 (optimizer master copy); the forward
    pass casts to the activation dtype (bf16 autocast-style)."""
    ld, vd = cfg.language_dim, cfg.vision_dim
    ffn = ld * cfg.ffn_mult
    blocks = {}
    for b in range(cfg.num_blocks):
        key = jax.random.fold_in(rng, b)
        ks = jax.random.split(key, 12)
        blocks[str(b)] = {
            "cross": {
                "q": _xavier(ks[0], ld, ld, dtype), "q_bias": jnp.zeros((ld,), dtype),
                "k": _xavier(ks[1], vd, ld, dtype), "k_bias": jnp.zeros((ld,), dtype),
                "v": _xavier(ks[2], vd, ld, dtype), "v_bias": jnp.zeros((ld,), dtype),
                "o": _xavier(ks[3], ld, ld, dtype), "o_bias": jnp.zeros((ld,), dtype),
            },
            "ln_cross": {"scale": jnp.ones((ld,), dtype), "bias": jnp.zeros((ld,), dtype)},
            "self": {
                "q": _xavier(ks[4], ld, ld, dtype), "q_bias": jnp.zeros((ld,), dtype),
                "k": _xavier(ks[5], ld, ld, dtype), "k_bias": jnp.zeros((ld,), dtype),
                "v": _xavier(ks[6], ld, ld, dtype), "v_bias": jnp.zeros((ld,), dtype),
                "o": _xavier(ks[7], ld, ld, dtype), "o_bias": jnp.zeros((ld,), dtype),
            },
            "ln_self": {"scale": jnp.ones((ld,), dtype), "bias": jnp.zeros((ld,), dtype)},
            "ffn": {
                "fc1": _xavier(ks[8], ld, ffn, dtype), "fc1_bias": jnp.zeros((ffn,), dtype),
                "fc2": _xavier(ks[9], ffn, ld, dtype), "fc2_bias": jnp.zeros((ld,), dtype),
            },
            "ln_ffn": {"scale": jnp.ones((ld,), dtype), "bias": jnp.zeros((ld,), dtype)},
        }
    return {"blocks": blocks}


def num_params(params: dict) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def quantize_decode_params(params: dict) -> dict:
    """Int8 weight-only quantization of the bridge for the serving decode
    path (inference/generate._bridge_decode_step dispatches on the dict
    weight form; ops/layers.linear handles plain projections).

    Following the measured launch-count lesson from the Gemma decoder
    (ops/quant.py): self-attention q/k/v are fused into ONE concatenated
    int8 weight (one kernel launch) and the FFN runs as the fused
    `int8_ffn` kernel. Cross-attention k/v stay unquantized — they run once
    per generation (cross K/V precompute), not once per token. Biases and
    LayerNorms stay f32.

    Training and the exact parity mode keep the original f32 params; this
    is a serving-time transformation only.
    """
    from vlm_bridge_tpu.ops.quant import quantize_int8

    blocks = {}
    for name, bp in params["blocks"].items():
        f32 = lambda w: jnp.asarray(w, jnp.float32)
        qkv = jnp.concatenate(
            [f32(bp["self"]["q"]), f32(bp["self"]["k"]), f32(bp["self"]["v"])],
            axis=1)
        blocks[name] = {
            "cross": {
                "q": quantize_int8(bp["cross"]["q"], axis=0),
                "q_bias": f32(bp["cross"]["q_bias"]),
                "k": bp["cross"]["k"], "k_bias": bp["cross"]["k_bias"],
                "v": bp["cross"]["v"], "v_bias": bp["cross"]["v_bias"],
                "o": quantize_int8(bp["cross"]["o"], axis=0),
                "o_bias": f32(bp["cross"]["o_bias"]),
            },
            "self": {
                "qkv": quantize_int8(qkv, axis=0),
                "q_bias": f32(bp["self"]["q_bias"]),
                "k_bias": f32(bp["self"]["k_bias"]),
                "v_bias": f32(bp["self"]["v_bias"]),
                "o": quantize_int8(bp["self"]["o"], axis=0),
                "o_bias": f32(bp["self"]["o_bias"]),
            },
            "ffn": {
                "fc1": quantize_int8(bp["ffn"]["fc1"], axis=0),
                "fc1_bias": f32(bp["ffn"]["fc1_bias"]),
                "fc2": quantize_int8(bp["ffn"]["fc2"], axis=0),
                "fc2_bias": f32(bp["ffn"]["fc2_bias"]),
            },
            "ln_cross": bp["ln_cross"],
            "ln_self": bp["ln_self"],
            "ln_ffn": bp["ln_ffn"],
        }
    return {"blocks": blocks}


def supports_fused_decode(params: dict) -> bool:
    """True when every projection the whole-bridge decode kernel streams is
    int8 (i.e. quantize_decode_params ran): cross q/o, fused self qkv,
    self o, ffn fc1/fc2."""
    for bp in params["blocks"].values():
        if not (isinstance(bp["cross"].get("q"), dict)
                and isinstance(bp["cross"].get("o"), dict)
                and isinstance(bp["self"].get("qkv"), dict)
                and isinstance(bp["self"].get("o"), dict)
                and isinstance(bp["ffn"].get("fc1"), dict)
                and isinstance(bp["ffn"].get("fc2"), dict)):
            return False
    return True


def stack_bridge_decode_params(params: dict, cfg: BridgeConfig) -> dict:
    """Block-stack the int8 bridge weights head-major for the whole-bridge
    decode kernel (ops/decode_kernels.fused_bridge_step).

    Head-major layouts exist because Mosaic cannot slice the lane dim at
    non-128-aligned offsets (the cross head dim is ld/Hc = 288 at the
    default config): per-(block, head) weight blocks are delivered by
    BlockSpec index maps instead of in-kernel slicing. Done once per
    generate call (~90 MB on-device copy), amortized over the caption
    batch."""
    nb = cfg.num_blocks
    ld = cfg.language_dim
    Hc, Hs = cfg.num_heads_cross, cfg.num_heads_self
    Dc, Ds = ld // Hc, ld // Hs
    f32 = jnp.float32
    bps = [params["blocks"][str(b)] for b in range(nb)]

    def stk(get):
        return jnp.stack([get(bp) for bp in bps])

    def qkv_w(bp):
        w = bp["self"]["qkv"]["w_int8"].reshape(ld, 3, Hs, Ds)
        return jnp.transpose(w, (2, 0, 1, 3)).reshape(Hs, ld, 3 * Ds)

    def qkv_s(bp):
        s = bp["self"]["qkv"]["scale"].astype(f32).reshape(3, Hs, Ds)
        return jnp.transpose(s, (1, 0, 2)).reshape(Hs, 1, 3 * Ds)

    def qkv_b(bp):
        b3 = jnp.stack([bp["self"][k].astype(f32).reshape(Hs, Ds)
                        for k in ("q_bias", "k_bias", "v_bias")], axis=1)
        return b3.reshape(Hs, 1, 3 * Ds)

    return {
        "lns": stk(lambda bp: jnp.stack([
            bp["ln_cross"]["scale"], bp["ln_cross"]["bias"],
            bp["ln_self"]["scale"], bp["ln_self"]["bias"],
            bp["ln_ffn"]["scale"], bp["ln_ffn"]["bias"]]).astype(f32)),
        "wq": stk(lambda bp: jnp.transpose(
            bp["cross"]["q"]["w_int8"].reshape(ld, Hc, Dc), (1, 0, 2))),
        "qsc": stk(lambda bp:
                   bp["cross"]["q"]["scale"].astype(f32).reshape(Hc, 1, Dc)),
        "qb": stk(lambda bp:
                  bp["cross"]["q_bias"].astype(f32).reshape(Hc, 1, Dc)),
        "woc": stk(lambda bp: bp["cross"]["o"]["w_int8"].reshape(Hc, Dc, ld)),
        "wocs": stk(lambda bp: bp["cross"]["o"]["scale"].astype(f32)[None]),
        "obc": stk(lambda bp: bp["cross"]["o_bias"].astype(f32)[None]),
        "wqkv": stk(qkv_w),
        "qkvs": stk(qkv_s),
        "qkvb": stk(qkv_b),
        "wos": stk(lambda bp: bp["self"]["o"]["w_int8"].reshape(Hs, Ds, ld)),
        "woss": stk(lambda bp: bp["self"]["o"]["scale"].astype(f32)[None]),
        "obs": stk(lambda bp: bp["self"]["o_bias"].astype(f32)[None]),
        "fc1": stk(lambda bp: bp["ffn"]["fc1"]["w_int8"]),
        "f1s": stk(lambda bp: bp["ffn"]["fc1"]["scale"].astype(f32)[None]),
        "f1b": stk(lambda bp: bp["ffn"]["fc1_bias"].astype(f32)[None]),
        "fc2": stk(lambda bp: bp["ffn"]["fc2"]["w_int8"]),
        "f2s": stk(lambda bp: bp["ffn"]["fc2"]["scale"].astype(f32)[None]),
        "f2b": stk(lambda bp: bp["ffn"]["fc2_bias"].astype(f32)[None]),
    }


def _dropout(x, rate, rng, train):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _w(w, dtype):
    """int8-quantized dicts pass through to `linear`'s kernel dispatch;
    plain arrays are cast to the activation dtype."""
    return w if isinstance(w, dict) else w.astype(dtype)


def _mha(proj: dict, q_in, kv_in, num_heads: int, dtype, key_mask=None,
         is_causal: bool = False):
    """Shared projection + attention core for cross/self attention.

    Accepts int8-quantized projections (models/bridge.quantize_decode_params),
    including the fused self-attention "qkv" weight form.

    key_mask: optional [B, S] (1 = attendable key). It is a right-padding
    prefix mask by loader contract, so the per-row lengths are forwarded to
    qualify padded shapes for the flash kernel.
    is_causal: causal masking for the self-attention (the opt-in causal
    bridge; see forward's `causal`)."""
    B, T, _ = q_in.shape
    S = kv_in.shape[1]
    if "qkv" in proj:  # fused self-attention weights (q_in is kv_in)
        d_model = q_in.shape[-1]
        qkv_bias = jnp.concatenate(
            [proj["q_bias"], proj["k_bias"], proj["v_bias"]]).astype(dtype)
        q, k, v = jnp.split(linear(q_in, proj["qkv"], qkv_bias), 3, axis=-1)
    else:
        d_model = (proj["q"]["w_int8"] if isinstance(proj["q"], dict)
                   else proj["q"]).shape[1]
        q = linear(q_in, _w(proj["q"], dtype), proj["q_bias"].astype(dtype))
        k = linear(kv_in, _w(proj["k"], dtype), proj["k_bias"].astype(dtype))
        v = linear(kv_in, _w(proj["v"], dtype), proj["v_bias"].astype(dtype))
    D = d_model // num_heads
    q = q.reshape(B, T, num_heads, D)
    k = k.reshape(B, S, num_heads, D)
    v = v.reshape(B, S, num_heads, D)
    mask = None
    kv_lengths = None
    if key_mask is not None:
        mask = key_mask[:, None, :].astype(bool)
        kv_lengths = key_mask.sum(axis=-1).astype(jnp.int32)
    out = dot_product_attention(q, k, v, scale=D ** -0.5, mask=mask,
                                is_causal=is_causal, kv_lengths=kv_lengths)
    out = out.reshape(B, T, d_model)
    return linear(out, _w(proj["o"], dtype), proj["o_bias"].astype(dtype))


def forward(
    params: dict,
    cfg: BridgeConfig,
    text_embeddings: jax.Array,   # [B, T, language_dim]
    vision_features: jax.Array,   # [B, S, vision_dim]
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    text_mask: Optional[jax.Array] = None,
    causal: bool = False,
) -> jax.Array:
    """Enhanced text embeddings [B, T, language_dim].

    Vision attends as global context (no mask — bridge_module.py:321).
    text_mask: optional [B, T] pad mask applied to self-attention KEYS — a fix
    over the reference (which lets pads leak into self-attention under dynamic
    padding); pass None to reproduce reference numerics exactly.
    causal: causal-mask the text self-attention. The reference trains the
    bridge NON-causally (bridge_module.py:355 — no mask) yet serves it
    autoregressively, which (a) leaks each next token into training position
    t via self-attention (teacher-forced loss is optimistic) and (b) makes
    cached incremental decode an approximation of the trained function.
    causal=True (TrainingConfig.bridge_causal) removes both: the trained
    conditional is exactly what the fast KV-cached decode computes, so a
    converged model's captions reproduce under greedy decode token-for-token
    (see tests/test_memorization.py). Default False = reference parity.
    """
    dtype = text_embeddings.dtype
    x = text_embeddings
    vision = vision_features.astype(dtype)
    eps = cfg.layer_norm_eps

    for b in range(cfg.num_blocks):
        bp = params["blocks"][str(b)]
        rngs = (
            jax.random.split(jax.random.fold_in(rng, b), 4)
            if (train and rng is not None) else (None,) * 4
        )

        h = layer_norm(x, bp["ln_cross"]["scale"], bp["ln_cross"]["bias"], eps)
        h = _mha(bp["cross"], h, vision, cfg.num_heads_cross, dtype)
        x = x + _dropout(h, cfg.dropout, rngs[2], train)

        h = layer_norm(x, bp["ln_self"]["scale"], bp["ln_self"]["bias"], eps)
        h = _mha(bp["self"], h, h, cfg.num_heads_self, dtype,
                 key_mask=text_mask, is_causal=causal)
        x = x + _dropout(h, cfg.dropout, rngs[3], train)

        h = layer_norm(x, bp["ln_ffn"]["scale"], bp["ln_ffn"]["bias"], eps)
        h = linear(h, _w(bp["ffn"]["fc1"], dtype), bp["ffn"]["fc1_bias"].astype(dtype))
        h = gelu_exact(h)
        h = _dropout(h, cfg.dropout, rngs[0], train)
        h = linear(h, _w(bp["ffn"]["fc2"], dtype), bp["ffn"]["fc2_bias"].astype(dtype))
        h = _dropout(h, cfg.dropout, rngs[1], train)
        x = x + h

    return x


def debug_forward(
    params: dict,
    cfg: BridgeConfig,
    text_embeddings: jax.Array,
    vision_features: jax.Array,
    *,
    text_mask: Optional[jax.Array] = None,
):
    """Deterministic forward that also returns per-block activation stats.

    TPU-native equivalent of the reference's debug mode (per-block mean/std
    prints + NaN/Inf checks, bridge_module.py:427-455): stats are reduced on
    device and returned as a pytree of scalars instead of printed mid-forward
    (printing inside jit is a trace-time no-op).

    Returns (output, stats) where stats["block_{b}"] has input/cross/self/ffn
    mean, std, abs-max, and nan/inf counts.
    """
    dtype = text_embeddings.dtype
    x = text_embeddings
    vision = vision_features.astype(dtype)
    eps = cfg.layer_norm_eps
    stats = {}

    def _stat(t):
        f = t.astype(jnp.float32)
        return {
            "mean": f.mean(), "std": f.std(),
            "abs_max": jnp.abs(f).max(),
            "nan_count": jnp.isnan(f).sum(),
            "inf_count": jnp.isinf(f).sum(),
        }

    for b in range(cfg.num_blocks):
        bp = params["blocks"][str(b)]
        s = {"input": _stat(x)}
        h = layer_norm(x, bp["ln_cross"]["scale"], bp["ln_cross"]["bias"], eps)
        x = x + _mha(bp["cross"], h, vision, cfg.num_heads_cross, dtype)
        s["after_cross"] = _stat(x)
        h = layer_norm(x, bp["ln_self"]["scale"], bp["ln_self"]["bias"], eps)
        x = x + _mha(bp["self"], h, h, cfg.num_heads_self, dtype,
                     key_mask=text_mask)
        s["after_self"] = _stat(x)
        h = layer_norm(x, bp["ln_ffn"]["scale"], bp["ln_ffn"]["bias"], eps)
        h = linear(h, bp["ffn"]["fc1"].astype(dtype), bp["ffn"]["fc1_bias"].astype(dtype))
        h = gelu_exact(h)
        h = linear(h, bp["ffn"]["fc2"].astype(dtype), bp["ffn"]["fc2_bias"].astype(dtype))
        x = x + h
        s["after_ffn"] = _stat(x)
        stats[f"block_{b}"] = s

    return x, stats


def has_anomaly(stats: dict) -> bool:
    """True if any debug stat shows NaN/Inf (host-side helper)."""
    import numpy as np

    for s in jax.tree.leaves({k: {kk: {"nan_count": vv["nan_count"],
                                       "inf_count": vv["inf_count"]}
                                  for kk, vv in v.items()}
                              for k, v in stats.items()}):
        if int(np.asarray(s)) > 0:
            return True
    return False
