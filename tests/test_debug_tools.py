"""Debugger + robust-generation tests (tiny model, hermetic).

Covers the SURVEY.md §2 "Generation debugger" component: per-step stats,
issue detection, strategy sweep, bridge-bypass A/B, JSON report — the
TPU-native equivalent of reference debug_generation.py:51-402 — and the
`generate_caption_robust` sweep (reference full_model.py:388-440).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlm_bridge_tpu.configs import VLMConfig
from vlm_bridge_tpu.data.tokenizer import ByteTokenizer
from vlm_bridge_tpu.inference.generate import GenerationConfig, generate_tokens
from vlm_bridge_tpu.inference.robust import (
    decode_captions, generate_caption_robust, is_degenerate)
from vlm_bridge_tpu.models import full_model
from vlm_bridge_tpu.tools.debug_generation import GenerationDebugger


@pytest.fixture(scope="module")
def setup():
    cfg = VLMConfig.tiny_test()
    params = full_model.init(jax.random.key(0), cfg, frozen_dtype=jnp.float32)
    pixels = jnp.asarray(
        np.random.default_rng(0).normal(
            0, 1, (1, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    return cfg, params, pixels


def test_debugger_trace(setup):
    cfg, params, pixels = setup
    dbg = GenerationDebugger(params, cfg, ByteTokenizer())
    rep = dbg.debug_generation(pixels, max_length=5)
    assert 1 <= len(rep.steps) <= 5
    s = rep.steps[0]
    assert len(s.top5_ids) == 5 and len(s.top5_probs) == 5
    # probabilities are a sane partial distribution, descending
    assert all(s.top5_probs[i] >= s.top5_probs[i + 1] for i in range(4))
    assert s.nan_count == 0 and s.inf_count == 0
    assert s.embed_norm > 0 and s.hidden_norm > 0
    # greedy choice must be the top-1 token
    assert s.token == s.top5_ids[0]
    # trace tokens match the standalone generator (same greedy path)
    toks, _ = generate_tokens(
        params, cfg,
        vision_features=full_model.encode_image(params, cfg, pixels),
        gen=GenerationConfig(max_length=5, greedy=True, exact=True),
        activation_dtype=jnp.float32)
    want = [int(t) for t in np.asarray(toks)[0][: len(rep.tokens)]]
    assert rep.tokens == want


def test_debugger_detects_nan(setup):
    cfg, params, pixels = setup
    bad = jax.tree.map(lambda p: p, params)
    bad["bridge"] = jax.tree.map(
        lambda p: jnp.full_like(p, jnp.nan), params["bridge"])
    dbg = GenerationDebugger(bad, cfg, ByteTokenizer())
    rep = dbg.debug_generation(pixels, max_length=3)
    assert any("NaN" in i for i in rep.issues)


def test_bridge_bypass_ab(setup):
    cfg, params, pixels = setup
    dbg = GenerationDebugger(params, cfg, ByteTokenizer())
    ab = dbg.compare_bridge_bypass(pixels, max_length=4)
    assert set(ab) == {"with_bridge", "bypass_bridge"}
    # bypass must equal generating with bypass_bridge=True via the public API
    toks, lens = generate_tokens(
        params, cfg,
        vision_features=full_model.encode_image(params, cfg, pixels),
        gen=GenerationConfig(max_length=4, greedy=True, exact=True,
                             bypass_bridge=True),
        activation_dtype=jnp.float32)
    assert ab["bypass_bridge"] == decode_captions(
        ByteTokenizer(), toks, lens)[0]


@pytest.mark.slow
def test_full_report_json(setup, tmp_path):
    cfg, params, pixels = setup
    dbg = GenerationDebugger(params, cfg, ByteTokenizer())
    path = tmp_path / "report.json"
    rep = dbg.full_report(pixels, max_length=3, save_path=str(path))
    data = json.loads(path.read_text())
    assert set(data) == {"caption", "tokens", "issues", "steps",
                         "strategies", "bridge_ab"}
    assert len(data["strategies"]) == 5
    assert data["caption"] == rep.caption


def test_is_degenerate():
    assert is_degenerate("")
    assert is_degenerate("word")
    assert is_degenerate("a b the the the the end")
    assert not is_degenerate("a dog runs across the field")


@pytest.mark.slow
def test_generate_caption_robust(setup):
    cfg, params, pixels = setup
    out = generate_caption_robust(
        params, cfg, pixels, ByteTokenizer(), max_length=5)
    assert set(out["results"]) == {
        "conservative", "greedy", "low_temp", "medium_temp", "high_temp"}
    assert not any(c.startswith("ERROR") for c in out["results"].values())
    assert isinstance(out["caption"], str)
