"""Interpret-mode correctness for the ViT projection matmul kernel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_bridge_tpu.ops import matmul_kernels as mk


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(mk, "INTERPRET", True)


def _ref(a, b, bias=None, gelu=False):
    y = jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if gelu:
        y = jax.nn.gelu(y, approximate=False)
    return y


@pytest.mark.parametrize("M,K,N", [
    (257, 64, 96),     # ragged M (one tiny image's tokens)
    (512, 128, 256),   # exact blocks
    (520, 64, 136),    # ragged M and N
])
def test_tiled_matmul_matches_xla(M, K, N):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    got = mk.tiled_matmul(a, b, block_m=128, block_n=128)
    want = _ref(a, b).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.1)


def test_tiled_matmul_bias_gelu():
    rng = np.random.default_rng(1)
    M, K, N = 320, 64, 160
    a = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    got = mk.tiled_matmul(a, b, bias, block_m=128, block_n=128, gelu=True)
    want = _ref(a, b, bias, gelu=True).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.1)


def test_encoder_path_dispatches_and_matches(monkeypatch):
    """dinov2.forward numerics are unchanged when the kernel path is on."""
    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.models import dinov2

    cfg = VLMConfig.tiny_test()
    params = dinov2.init(jax.random.key(0), cfg.vision)
    rng = np.random.default_rng(2)
    pixels = jnp.asarray(
        rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)), jnp.bfloat16)

    base = dinov2.forward(params, cfg.vision, pixels)
    monkeypatch.setenv("VLM_BRIDGE_VIT_MM", "pallas")
    fused = dinov2.forward(params, cfg.vision, pixels)
    np.testing.assert_allclose(
        np.asarray(base, np.float32), np.asarray(fused, np.float32),
        rtol=0.08, atol=0.15)


def test_default_blocks_resolve_at_call_time(monkeypatch):
    """Probe scripts retune DEFAULT_BLOCK_M/N by mutating the module attrs
    (scripts/encoder_mm_ab.py --block-m/--block-n); the wrapper must read
    them per call, not bind them at def time, or the full-encode A/B
    silently measures the stock blocks under the retuned label."""
    seen = {}
    real = mk._tiled_matmul_jit

    def spy(a, b, bias=None, *, block_m, block_n, **kw):
        seen["blocks"] = (block_m, block_n)
        return real(a, b, bias, block_m=block_m, block_n=block_n, **kw)

    monkeypatch.setattr(mk, "_tiled_matmul_jit", spy)
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(64, 32)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(32, 64)), jnp.bfloat16)

    monkeypatch.setattr(mk, "DEFAULT_BLOCK_M", 64)
    monkeypatch.setattr(mk, "DEFAULT_BLOCK_N", 64)
    mk.tiled_matmul(a, b)
    assert seen["blocks"] == (64, 64)

    monkeypatch.setattr(mk, "DEFAULT_BLOCK_M", 32)
    mk.tiled_matmul(a, b)
    assert seen["blocks"] == (32, 64)

    mk.tiled_matmul(a, b, block_m=16, block_n=16)  # explicit args still win
    assert seen["blocks"] == (16, 16)
