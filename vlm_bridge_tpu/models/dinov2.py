"""DINOv2 ViT encoder, pure JAX.

Architecture (verified against HF `transformers` Dinov2 modeling code, which
the reference wraps via `facebook/dinov2-large` —
reference: src/vlm_bridge/model_architecture/vision_encoder.py:50-94):

- 14x14 conv patch embedding + CLS token + learned position embeddings
  (bicubically interpolated from the native 37x37 grid to the input grid)
- per layer: LN -> MHA -> LayerScale -> +res; LN -> MLP(GELU) -> LayerScale -> +res
- final LayerNorm

Output for 224px input: [B, 257, 1024] (CLS + 256 patches), matching the
reference's `VisionEncoder.forward` contract (vision_encoder.py:71-94).

The encoder is frozen in this framework: `forward` is wrapped in
`stop_gradient` by callers; no optimizer state is ever created for it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import DinoV2Config
from vlm_bridge_tpu.ops.attention import _use_pallas, dot_product_attention
from vlm_bridge_tpu.ops.layers import gelu_exact, layer_norm, linear


def init(rng: jax.Array, cfg: DinoV2Config, dtype=jnp.bfloat16) -> dict:
    """Random init (tests/benchmarks; real weights come from converters)."""
    h = cfg.hidden_size
    n_pos = cfg.native_grid ** 2 + 1
    keys = jax.random.split(rng, cfg.num_layers + 3)

    def dense(key, fan_in, fan_out):
        return (jax.random.normal(key, (fan_in, fan_out), jnp.float32) * 0.02).astype(dtype)

    layers = {}
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[i], 8)
        if cfg.use_swiglu_ffn:  # dinov2-giant
            hf = cfg.swiglu_hidden
            mlp = {
                "win": dense(ks[4], h, 2 * hf),
                "win_bias": jnp.zeros((2 * hf,), dtype),
                "wout": dense(ks[5], hf, h),
                "wout_bias": jnp.zeros((h,), dtype),
            }
        else:
            mlp_hidden = h * cfg.mlp_ratio
            mlp = {
                "fc1": dense(ks[4], h, mlp_hidden),
                "fc1_bias": jnp.zeros((mlp_hidden,), dtype),
                "fc2": dense(ks[5], mlp_hidden, h),
                "fc2_bias": jnp.zeros((h,), dtype),
            }
        layers[str(i)] = {
            "norm1": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
            "norm2": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
            # Q/K/V are stored FUSED as one [h, 3h] weight ([q|k|v] along the
            # output dim). On v5e a [B*257, 1024]x[1024, 1024] dot runs at
            # ~39 TFLOP/s while the fused [1024, 3072] runs at ~99 (small-N
            # matmuls underfill the MXU pipeline; measured via /tmp sweep,
            # 0.447 ms vs 0.521 ms per layer at batch 32) — 3x the FLOPs for
            # +17% time. The converter concatenates HF's separate tensors.
            "attn": {
                "qkv": jnp.concatenate(
                    [dense(ks[0], h, h), dense(ks[1], h, h), dense(ks[2], h, h)],
                    axis=1),
                "qkv_bias": jnp.zeros((3 * h,), dtype),
                "o": dense(ks[3], h, h), "o_bias": jnp.zeros((h,), dtype),
            },
            "mlp": mlp,
            "layerscale1": jnp.full((h,), cfg.layerscale_value, dtype),
            "layerscale2": jnp.full((h,), cfg.layerscale_value, dtype),
        }
    return {
        # Conv kernel stored [ph, pw, C, h] (HWIO); converters transpose torch OIHW.
        "patch_embed": {
            "kernel": (jax.random.normal(
                keys[-3], (cfg.patch_size, cfg.patch_size, cfg.num_channels, h),
                jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((h,), dtype),
        },
        "cls_token": (jax.random.normal(keys[-2], (1, 1, h), jnp.float32) * 0.02).astype(dtype),
        "pos_embed": (jax.random.normal(keys[-1], (1, n_pos, h), jnp.float32) * 0.02).astype(dtype),
        "final_norm": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        "layers": layers,
    }


def quantize_vision_params(params: dict) -> dict:
    """Int8 weight-only quantization of the encoder's transformer matmuls
    (serving-time transformation, like gemma2.quantize_params /
    bridge.quantize_decode_params — `--quantize vision,...`).

    Quantizes the per-layer qkv / o / fc1 / fc2 (or SwiGLU win / wout)
    projections to symmetric per-output-channel int8 dicts; ops.layers.linear
    dispatches them transparently (and _proj's XLA/Pallas bf16 route is
    dict-aware, so the dispatch stays correct). The patch-embed kernel
    (0.6M params, C=3 — terrible int8 shape), position/CLS embeddings,
    LayerNorms, LayerScales, and biases stay in the float dtype.

    Why it exists: capacity. The bf16 DINOv2-large tower is 0.61 GB of the
    9B serving footprint; int8 halves it, and at 9B the fused decode sits
    within ~0.4 GB of the chip's working line (perf/fused_mem_analysis.jsonl).
    Quality bound at random init: see tests/test_dinov2_parity.py."""
    from vlm_bridge_tpu.ops.quant import quantize_int8

    out = {k: v for k, v in params.items() if k != "layers"}
    layers = {}
    for name, lp in params["layers"].items():
        lp = {k: v for k, v in lp.items()}
        attn = dict(lp["attn"])
        attn["qkv"] = quantize_int8(attn["qkv"], axis=0)
        attn["o"] = quantize_int8(attn["o"], axis=0)
        lp["attn"] = attn
        mlp = dict(lp["mlp"])
        for w in ("fc1", "fc2", "win", "wout"):
            if w in mlp:
                mlp[w] = quantize_int8(mlp[w], axis=0)
        lp["mlp"] = mlp
        layers[name] = lp
    out["layers"] = layers
    return out


def interpolate_pos_embed(pos_embed: jax.Array, cfg: DinoV2Config, grid: int) -> jax.Array:
    """Bicubic interpolation of patch position embeddings to a new grid size.

    Matches HF `Dinov2Embeddings.interpolate_pos_encoding` (f32 bicubic,
    align_corners=False == jax.image 'cubic' on a regular grid).
    """
    n_pos = pos_embed.shape[1] - 1
    native = int(round(n_pos ** 0.5))
    if native == grid:
        return pos_embed
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:].astype(jnp.float32)
    h = patch_pos.shape[-1]
    patch_pos = patch_pos.reshape(1, native, native, h)
    patch_pos = jax.image.resize(
        patch_pos, (1, grid, grid, h), method="bicubic", antialias=False
    )
    patch_pos = patch_pos.reshape(1, grid * grid, h).astype(pos_embed.dtype)
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


def _proj(x: jax.Array, w, b, *, gelu: bool = False) -> jax.Array:
    """Encoder projection: [B, T, K] @ [K, N] (+ bias) (+ exact GELU).

    Routes through ops.matmul_kernels.tiled_matmul when VLM_BRIDGE_VIT_MM=
    pallas (measured-dispatch: XLA tiles the encoder's N=1024 projections
    at ~39 TFLOP/s vs ~120 achievable — see that module's docstring);
    otherwise the plain XLA path, identical numerics up to dot tiling.
    """
    from vlm_bridge_tpu.ops import matmul_kernels as mk

    if (mk.vit_mm_mode() == "pallas" and not isinstance(w, dict)
            and x.ndim == 3 and (_use_pallas() or mk.INTERPRET)):
        B, T, K = x.shape
        y = mk.tiled_matmul(
            x.reshape(B * T, K), w.astype(x.dtype), b.astype(jnp.float32),
            gelu=gelu)
        return y.reshape(B, T, -1)
    y = linear(x, w, b)
    return gelu_exact(y) if gelu else y


def _mlp(mp: dict, x: jax.Array) -> jax.Array:
    """GELU MLP (base/large) or SwiGLU FFN (giant; HF Dinov2SwiGLUFFN:
    weights_in -> chunk2 -> silu(x1)*x2 -> weights_out)."""
    if "win" in mp:
        h = linear(x, mp["win"], mp["win_bias"])
        x1, x2 = jnp.split(h, 2, axis=-1)
        return linear(jax.nn.silu(x1) * x2, mp["wout"], mp["wout_bias"])
    h = _proj(x, mp["fc1"], mp["fc1_bias"], gelu=True)
    return _proj(h, mp["fc2"], mp["fc2_bias"])


def _attention(lp: dict, cfg: DinoV2Config, x: jax.Array) -> jax.Array:
    B, T, h = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    qkv = _proj(x, lp["attn"]["qkv"], lp["attn"]["qkv_bias"])  # [B, T, 3h]
    q, k, v = (qkv[..., :h].reshape(B, T, H, D),
               qkv[..., h:2 * h].reshape(B, T, H, D),
               qkv[..., 2 * h:].reshape(B, T, H, D))
    out = dot_product_attention(q, k, v, scale=D ** -0.5)
    return _proj(out.reshape(B, T, h), lp["attn"]["o"], lp["attn"]["o_bias"])


def forward(
    params: dict,
    cfg: DinoV2Config,
    pixel_values: jax.Array,
) -> jax.Array:
    """pixel_values: [B, H, W, C] (NHWC, already normalized) -> [B, 1+N, hidden].

    NHWC is the TPU-native conv layout; the data pipeline produces it directly
    (torch-side comparisons transpose their NCHW input).
    """
    B, H_img, W_img, C = pixel_values.shape
    P = cfg.patch_size
    if H_img != W_img or H_img % P != 0:
        # the patchify reshape below needs an exact square grid (the conv it
        # replaced silently VALID-cropped remainders; be loud instead —
        # the data pipeline always emits image_size x image_size)
        raise ValueError(
            f"pixel_values must be square with height/width a multiple of "
            f"patch_size={P}; got {H_img}x{W_img}. Resize via "
            f"data.preprocess (images are {cfg.image_size}x{cfg.image_size} "
            f"in this stack).")
    grid = H_img // P

    # Non-overlapping stride==kernel patch embedding IS a matmul: extract
    # [P, P, C] patches and multiply by the flattened HWIO kernel. The
    # equivalent conv_general_dilated measured 7.4 ms at batch 32 on v5e
    # (~150x off roofline — C=3 convs tile terribly on the MXU); the
    # patchify matmul is ~0.1 ms.
    patches = pixel_values.reshape(B, grid, P, grid, P, C)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(B, grid * grid, P * P * C)
    kernel = params["patch_embed"]["kernel"].astype(pixel_values.dtype)
    x = jnp.dot(patches, kernel.reshape(P * P * C, cfg.hidden_size),
                preferred_element_type=pixel_values.dtype)
    x = x + params["patch_embed"]["bias"].astype(x.dtype)  # [B, N, h]

    cls = jnp.broadcast_to(
        params["cls_token"].astype(x.dtype), (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    # Torch's bicubic kernel (A=-0.75) differs from jax.image's (A=-0.5), so
    # for converted checkpoints the weight converter precomputes the
    # interpolated table with torch and stores it under this key; random-init
    # runs and native-grid inputs use the JAX path.
    interp_key = f"pos_embed_interp_{grid}"
    if interp_key in params:
        pos = params[interp_key]
    else:
        pos = interpolate_pos_embed(params["pos_embed"], cfg, grid)
    x = x + pos.astype(x.dtype)

    eps = cfg.layer_norm_eps
    for i in range(cfg.num_layers):
        lp = params["layers"][str(i)]
        h = layer_norm(x, lp["norm1"]["scale"], lp["norm1"]["bias"], eps)
        h = _attention(lp, cfg, h)
        x = x + h * lp["layerscale1"].astype(x.dtype)
        h = layer_norm(x, lp["norm2"]["scale"], lp["norm2"]["bias"], eps)
        h = _mlp(lp["mlp"], h)
        x = x + h * lp["layerscale2"].astype(x.dtype)

    return layer_norm(x, params["final_norm"]["scale"], params["final_norm"]["bias"], eps)
