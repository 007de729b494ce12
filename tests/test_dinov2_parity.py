"""Numerics parity: JAX DINOv2 ViT vs HF transformers (torch CPU), tiny config.

Covers: conv patch embedding, CLS token, position embeddings, pre-LN MHA,
LayerScale, GELU MLP, final LayerNorm — the full frozen vision path
(reference: src/vlm_bridge/model_architecture/vision_encoder.py:71-94).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from vlm_bridge_tpu.configs import DinoV2Config
from vlm_bridge_tpu.models import dinov2
from vlm_bridge_tpu.params.hf_loader import dinov2_from_state_dict

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Dinov2Config as HFConfig
    from transformers.models.dinov2.modeling_dinov2 import Dinov2Model

    cfg = DinoV2Config.tiny_test()
    hf_cfg = HFConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        layerscale_value=cfg.layerscale_value,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Dinov2Model(hf_cfg).eval()
    return cfg, model


def test_forward_parity_native_grid(hf_model):
    cfg, model = hf_model
    params = dinov2_from_state_dict(model.state_dict(), cfg, dtype=jnp.float32,
                                    target_grids=())
    B = 2
    rng = np.random.default_rng(1)
    # NCHW for torch, NHWC for JAX
    pixels = rng.normal(0, 1, (B, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(pixels)).last_hidden_state.numpy()
    mine = np.asarray(dinov2.forward(
        params, cfg, jnp.asarray(pixels.transpose(0, 2, 3, 1))))
    assert mine.shape == ref.shape  # [B, 1 + grid^2, hidden]
    np.testing.assert_allclose(mine, ref, atol=3e-4, rtol=3e-3)


def test_forward_parity_interpolated_grid(hf_model):
    """Input at a different resolution -> bicubic pos-embed interpolation.
    Uses the torch-exact interpolation table the converter precomputes."""
    cfg, model = hf_model
    size = 42  # grid 3 vs native grid 5
    params = dinov2_from_state_dict(model.state_dict(), cfg, dtype=jnp.float32,
                                    target_grids=(size // cfg.patch_size,))
    B = 2
    rng = np.random.default_rng(2)
    pixels = rng.normal(0, 1, (B, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(pixels)).last_hidden_state.numpy()
    mine = np.asarray(dinov2.forward(
        params, cfg, jnp.asarray(pixels.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(mine, ref, atol=3e-4, rtol=3e-3)


def test_output_contract_large_config_shapes():
    """The 224px pipeline contract: [B, 257, 1024] (vision_encoder.py:71-94).
    Shape-only check with the real `large` config geometry (random weights,
    1 layer to keep CPU time sane)."""
    import dataclasses
    import jax

    cfg = dataclasses.replace(DinoV2Config.large(), num_layers=1)
    params = dinov2.init(jax.random.key(0), cfg, dtype=jnp.float32)
    out = dinov2.forward(params, cfg, jnp.zeros((1, 224, 224, 3), jnp.float32))
    assert out.shape == (1, 257, 1024)


def test_swiglu_ffn_parity():
    """dinov2-giant's SwiGLU FFN variant vs HF (tiny dims, f32)."""
    import dataclasses

    from transformers import Dinov2Config as HFConfig
    from transformers.models.dinov2.modeling_dinov2 import Dinov2Model

    cfg = dataclasses.replace(DinoV2Config.tiny_test(), use_swiglu_ffn=True)
    hf_cfg = HFConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        layerscale_value=cfg.layerscale_value,
        use_swiglu_ffn=True,
        attn_implementation="eager")
    torch.manual_seed(1)
    model = Dinov2Model(hf_cfg).eval()

    # HF and this config must agree on the SwiGLU hidden width
    assert model.encoder.layer[0].mlp.weights_out.in_features == cfg.swiglu_hidden

    from vlm_bridge_tpu.params.hf_loader import dinov2_from_state_dict

    params = dinov2_from_state_dict(
        model.state_dict(), cfg, dtype=jnp.float32,
        target_grids=(cfg.native_grid,))
    import numpy as np

    from vlm_bridge_tpu.models import dinov2

    x = np.random.default_rng(0).normal(
        0, 1, (2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    import torch as _torch

    with _torch.no_grad():
        want = model(_torch.from_numpy(x.transpose(0, 3, 1, 2))
                     ).last_hidden_state.numpy()
    got = np.asarray(dinov2.forward(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)


def test_family_presets():
    for cfg, hidden, layers in ((DinoV2Config.base(), 768, 12),
                                (DinoV2Config.large(), 1024, 24),
                                (DinoV2Config.giant(), 1536, 40)):
        assert cfg.hidden_size == hidden and cfg.num_layers == layers
        assert cfg.hidden_size % cfg.num_heads == 0
    assert DinoV2Config.giant().use_swiglu_ffn
    # HF dinov2-giant: mlp_ratio 4 * 1536 -> swiglu hidden 4096
    assert DinoV2Config.giant().swiglu_hidden == 4096


def test_int8_vision_quantization():
    """quantize_vision_params: int8 tower halves the transformer-weight bytes
    and stays numerically close to the float forward (the 9B capacity lever —
    DESIGN.md §3; per-channel symmetric int8 on qkv/o/fc1/fc2 only)."""
    import dataclasses
    import jax

    cfg = dataclasses.replace(
        DinoV2Config.large(), num_layers=2, hidden_size=64, num_heads=4)
    params = dinov2.init(jax.random.key(0), cfg, dtype=jnp.float32)
    qparams = dinov2.quantize_vision_params(params)

    # int8 where promised, untouched elsewhere
    l0 = qparams["layers"]["0"]
    assert l0["attn"]["qkv"]["w_int8"].dtype == jnp.int8
    assert l0["mlp"]["fc1"]["w_int8"].dtype == jnp.int8
    assert l0["norm1"]["scale"].dtype == params["layers"]["0"]["norm1"]["scale"].dtype
    assert qparams["patch_embed"]["kernel"].dtype == params["patch_embed"]["kernel"].dtype
    # the original tree is not mutated
    assert not isinstance(params["layers"]["0"]["attn"]["qkv"], dict)

    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 224, 224, 3)), jnp.float32)
    ref = np.asarray(dinov2.forward(params, cfg, x))
    out = np.asarray(dinov2.forward(qparams, cfg, x))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.05, f"int8 vision tower rel err {rel:.4f}"
