"""Bridge-Lite tests: numerics vs an independent torch realization of the
same architecture, checkpoint round-trip through the reference .pth formats,
and parameter-count / gradient sanity.

The torch model below is written from the architecture spec (cross-attn 8
heads with kv-dim alignment, self-attn 18-style heads, pre-LN, FFN x mult) —
it is the test oracle for weight-compatibility, independent of HF.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import BridgeConfig
from vlm_bridge_tpu.models import bridge
from vlm_bridge_tpu.params import torch_bridge

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def build_torch_bridge(cfg: BridgeConfig):
    """Independent torch construction with reference-compatible param names."""

    class Attn(nn.Module):
        def __init__(self, q_dim, kv_dim, d_model, heads):
            super().__init__()
            self.heads, self.dk = heads, d_model // heads
            self.w_q = nn.Linear(q_dim, d_model)
            self.w_k = nn.Linear(kv_dim, d_model)
            self.w_v = nn.Linear(kv_dim, d_model)
            self.w_o = nn.Linear(d_model, q_dim)

        def forward(self, q_in, kv_in):
            B, T, _ = q_in.shape
            S = kv_in.shape[1]
            q = self.w_q(q_in).view(B, T, self.heads, self.dk).transpose(1, 2)
            k = self.w_k(kv_in).view(B, S, self.heads, self.dk).transpose(1, 2)
            v = self.w_v(kv_in).view(B, S, self.heads, self.dk).transpose(1, 2)
            o = F.scaled_dot_product_attention(q, k, v)
            o = o.transpose(1, 2).reshape(B, T, self.heads * self.dk)
            return self.w_o(o)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            ld, vd = cfg.language_dim, cfg.vision_dim
            self.cross_attention = Attn(ld, vd, ld, cfg.num_heads_cross)
            self.ln_cross = nn.LayerNorm(ld)
            self.self_attention = Attn(ld, ld, ld, cfg.num_heads_self)
            self.ln_self = nn.LayerNorm(ld)
            self.ffn = nn.Sequential(
                nn.Linear(ld, ld * cfg.ffn_mult), nn.GELU(), nn.Dropout(0.0),
                nn.Linear(ld * cfg.ffn_mult, ld), nn.Dropout(0.0))
            self.ln_ffn = nn.LayerNorm(ld)

        def forward(self, text, vision):
            text = text + self.cross_attention(self.ln_cross(text), vision)
            text = text + self.self_attention(
                self.ln_self(text), self.ln_self(text))
            text = text + self.ffn(self.ln_ffn(text))
            return text

    class Bridge(nn.Module):
        def __init__(self):
            super().__init__()
            self.bridge_blocks = nn.ModuleList(
                [Block() for _ in range(cfg.num_blocks)])

        def forward(self, text, vision):
            for b in self.bridge_blocks:
                text = b(text, vision)
            return text

    torch.manual_seed(0)
    return Bridge().eval()


@pytest.fixture(scope="module")
def cfg():
    return BridgeConfig.tiny_test()


def test_parity_vs_torch(cfg):
    model = build_torch_bridge(cfg)
    params = torch_bridge.bridge_from_state_dict(model.state_dict(), cfg)

    B, T, S = 2, 7, 9
    rng = np.random.default_rng(0)
    text = rng.normal(0, 0.3, (B, T, cfg.language_dim)).astype(np.float32)
    vision = rng.normal(0, 0.3, (B, S, cfg.vision_dim)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(text), torch.from_numpy(vision)).numpy()
    mine = np.asarray(bridge.forward(
        params, cfg, jnp.asarray(text), jnp.asarray(vision)))
    np.testing.assert_allclose(mine, ref, atol=2e-5, rtol=2e-4)


def test_pth_roundtrip(cfg, tmp_path):
    """pytree -> .pth (FullModel format) -> pytree, and trainer-format load
    (covers both reference on-disk layouts, SURVEY.md §2 note 1)."""
    params = bridge.init(jax.random.key(0), cfg)
    path = tmp_path / "bridge.pth"
    torch_bridge.save_pth(params, cfg, path)
    back = torch_bridge.load_pth(path, cfg)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        params, back)

    # trainer format: model_state_dict with "bridge_module." prefix
    sd = torch_bridge.bridge_to_state_dict(params, cfg)
    trainer_ckpt = {
        "model_state_dict": {
            "bridge_module." + k: torch.from_numpy(v) for k, v in sd.items()},
        "epoch": 3,
    }
    p2 = tmp_path / "trainer.pth"
    torch.save(trainer_ckpt, p2)
    back2 = torch_bridge.load_pth(p2, cfg)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        params, back2)


def test_param_count_default_config():
    """Code-actual reference param count: 79,080,192/block -> 158,160,384
    total for the default 2-block bridge (SURVEY.md §2; the reference README's
    66.1M claim is stale). eval_shape counts without materializing the 158M
    Xavier init (which costs ~2 min of single-core threefry)."""
    shapes = jax.eval_shape(
        lambda: bridge.init(jax.random.key(0), BridgeConfig.default()))
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert n == 158_160_384


def test_gradients_flow_and_dropout_determinism(cfg):
    params = bridge.init(jax.random.key(1), cfg)
    B, T, S = 2, 5, 4
    rng_np = np.random.default_rng(11)
    text = jnp.asarray(rng_np.normal(0, 0.3, (B, T, cfg.language_dim)), jnp.float32)
    vision = jnp.asarray(rng_np.normal(0, 0.3, (B, S, cfg.vision_dim)), jnp.float32)

    def loss(p):
        return jnp.sum(bridge.forward(p, cfg, text, vision) ** 2)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) > len(norms) * 0.9

    # train=True dropout: deterministic given rng, differs from eval
    r = jax.random.key(7)
    a = bridge.forward(params, cfg, text, vision, rng=r, train=True)
    b = bridge.forward(params, cfg, text, vision, rng=r, train=True)
    c = bridge.forward(params, cfg, text, vision)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_text_mask_blocks_pad_influence(cfg):
    """A masked (pad) position must not influence real positions."""
    params = bridge.init(jax.random.key(2), cfg)
    B, T, S = 1, 6, 4
    rng = np.random.default_rng(3)
    text = rng.normal(0, 0.3, (B, T, cfg.language_dim)).astype(np.float32)
    vision = rng.normal(0, 0.3, (B, S, cfg.vision_dim)).astype(np.float32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)

    out1 = bridge.forward(params, cfg, jnp.asarray(text), jnp.asarray(vision),
                          text_mask=mask)
    text2 = text.copy()
    text2[0, 4:] = 99.0  # perturb pads
    out2 = bridge.forward(params, cfg, jnp.asarray(text2), jnp.asarray(vision),
                          text_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out1[:, :4]), np.asarray(out2[:, :4]), atol=1e-5)


def test_causal_bridge_blocks_future_influence(cfg):
    """With causal=True, position t's output must be independent of every
    position > t (the reference's non-causal bridge leaks the next token
    into training position t — see bridge.forward docstring); and the
    causal output must differ from the non-causal one (the mask is live)."""
    params = bridge.init(jax.random.key(4), cfg)
    B, T, S = 1, 6, 4
    rng = np.random.default_rng(5)
    text = rng.normal(0, 0.3, (B, T, cfg.language_dim)).astype(np.float32)
    vision = rng.normal(0, 0.3, (B, S, cfg.vision_dim)).astype(np.float32)
    mask = jnp.ones((B, T), jnp.int32)

    out1 = bridge.forward(params, cfg, jnp.asarray(text), jnp.asarray(vision),
                          text_mask=mask, causal=True)
    text2 = text.copy()
    text2[0, 3:] = 7.0  # perturb the future
    out2 = bridge.forward(params, cfg, jnp.asarray(text2), jnp.asarray(vision),
                          text_mask=mask, causal=True)
    np.testing.assert_allclose(
        np.asarray(out1[:, :3]), np.asarray(out2[:, :3]), atol=1e-5)

    noncausal = bridge.forward(
        params, cfg, jnp.asarray(text), jnp.asarray(vision), text_mask=mask)
    assert not np.allclose(np.asarray(out1), np.asarray(noncausal))


def test_debug_forward_stats(cfg):
    import jax
    import jax.numpy as jnp
    from vlm_bridge_tpu.models.bridge import debug_forward, forward, has_anomaly

    params = bridge.init(jax.random.key(0), cfg)
    B, T, S = 2, 6, 5
    text = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (B, T, cfg.language_dim)),
        jnp.float32)
    vision = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (B, S, cfg.vision_dim)),
        jnp.float32)
    out, stats = debug_forward(params, cfg, text, vision)
    # debug forward output == plain eval forward
    ref = forward(params, cfg, text, vision)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    assert set(stats) == {f"block_{b}" for b in range(cfg.num_blocks)}
    s0 = stats["block_0"]
    assert set(s0) == {"input", "after_cross", "after_self", "after_ffn"}
    assert not has_anomaly(stats)

    bad = jax.tree.map(lambda p: jnp.full_like(p, jnp.nan), params)
    _, bad_stats = debug_forward(bad, cfg, text, vision)
    assert has_anomaly(bad_stats)
