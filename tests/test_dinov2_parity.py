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
