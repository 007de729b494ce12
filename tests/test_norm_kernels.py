"""Pallas LayerNorm kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vlm_bridge_tpu.ops import norm_kernels
from vlm_bridge_tpu.ops.layers import layer_norm


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(norm_kernels, "INTERPRET", True)


def _ref(x, s, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * s.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


@pytest.mark.parametrize("rows,h", [(300, 128), (256, 384), (1024, 1024)])
def test_forward_matches_reference(rows, h):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2, (rows, h)), jnp.float32)
    s = jnp.asarray(rng.normal(1, 0.2, (h,)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (h,)), jnp.float32)
    out = norm_kernels.layer_norm_fast(x, s, b, 1e-6)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(x, s, b, 1e-6)), atol=2e-5, rtol=2e-5)


def test_forward_bf16_and_ragged_grid():
    # 257 rows x 3 -> not a multiple of the 256-row block; masked tail
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (3 * 257, 256)), jnp.bfloat16)
    s = jnp.ones((256,), jnp.bfloat16)
    b = jnp.zeros((256,), jnp.bfloat16)
    out = norm_kernels.layer_norm_fast(x, s, b, 1e-6)
    ref = _ref(x, s, b, 1e-6)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-2)


def test_high_mean_rows_no_cancellation():
    # the advisor's DINOv2 outlier-token regime: |mean| >> std
    rng = np.random.default_rng(2)
    base = rng.normal(0, 1, (1024, 128))
    x = jnp.asarray(base + 300.0, jnp.float32)
    s = jnp.ones((128,), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    out = np.asarray(norm_kernels.layer_norm_fast(x, s, b, 1e-6))
    expect = (base - base.mean(-1, keepdims=True)) / np.sqrt(
        base.var(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(out, expect, atol=1e-3)
    # ... and the jnp one-pass path (pivot-shifted) survives it too
    jn = np.asarray(layer_norm(x, s, b, 1e-6))
    np.testing.assert_allclose(jn, expect, atol=1e-3)


def test_vjp_matches_reference_grads():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (512, 128)), jnp.float32)
    s = jnp.asarray(rng.normal(1, 0.2, (128,)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (128,)), jnp.float32)

    def loss_k(x, s, b):
        y = norm_kernels.layer_norm_fast(x, s, b, 1e-6)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_r(x, s, b):
        y = _ref(x, s, b, 1e-6)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, s, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, s, b)
    for a, e in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=3e-4, rtol=3e-4)
