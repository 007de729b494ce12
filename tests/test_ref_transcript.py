"""Offline drive of the reference-side transcript dumper.

scripts/ref_record_transcript.py instruments the REFERENCE FullModel's
greedy generation (tapping its single final `decode_text(input_ids)` call)
and writes the `vlm-parity check` JSONL. The real reference stack needs HF
weights (network-gated here), so these tests drive the transcript-writing
half with a hybrid stand-in that has the same surface and the same
generation semantics — the reference torch bridge doing the bridging
(tests/test_reference_oracle.py pattern) and the tiny JAX Gemma as the LM —
then close the loop: the recorded tokens must equal our exact-mode greedy
decode token-for-token, which is precisely what `vlm-parity check` asserts.
"""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import (
    BridgeConfig, DinoV2Config, Gemma2Config, VLMConfig)
from vlm_bridge_tpu.models import gemma2
from vlm_bridge_tpu.params.torch_bridge import bridge_from_state_dict

torch = pytest.importorskip("torch")

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"
REF_BRIDGE = Path(
    "/root/reference/src/vlm_bridge/model_architecture/bridge_module.py")
pytestmark = pytest.mark.skipif(
    not REF_BRIDGE.exists(), reason="reference checkout not available")

TINY = BridgeConfig(vision_dim=32, language_dim=64, num_blocks=2,
                    num_heads_cross=2, num_heads_self=4, ffn_mult=4,
                    dropout=0.0)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def dumper():
    return _load(SCRIPTS / "ref_record_transcript.py", "ref_record_transcript")


@pytest.fixture(scope="module")
def ref():
    return _load(REF_BRIDGE, "ref_bridge_module_for_transcript")


def _make_cfg():
    return VLMConfig(vision=DinoV2Config.tiny_test(),
                     lm=Gemma2Config.tiny_test(), bridge=TINY, image_size=70)


class _HybridLM:
    """`language_model` surface the tap wraps: decode_text only."""

    def decode_text(self, input_ids):
        ids = input_ids.detach().cpu().reshape(-1).tolist()
        return [" ".join(str(i) for i in ids)]


class _HybridRefModel:
    """Reference FullModel surface (generate_caption -> final decode_text)
    with the reference torch bridge + tiny JAX Gemma inside — the same
    no-KV-cache greedy loop as full_model.py:241-373, including the EOS
    break and the final decode_text(input_ids) the dumper taps."""

    def __init__(self, params, cfg, ref_bridge):
        self.params, self.cfg, self.bridge = params, cfg, ref_bridge
        self.language_model = _HybridLM()

    def generate_caption(self, image, max_length=50, do_sample=True,
                         temperature=1.0, top_p=0.9):
        assert not do_sample, "transcript dumper must request greedy"
        lm = self.cfg.lm
        vision_t = torch.from_numpy(np.asarray(image, np.float32))[None]
        ids = [lm.bos_token_id]
        for _ in range(max_length):
            toks = jnp.asarray(np.asarray(ids, np.int32))[None]
            embeds = gemma2.embed(self.params["lm"], toks)
            with torch.no_grad():
                bridged = self.bridge(
                    vision_t,
                    torch.from_numpy(np.asarray(embeds, np.float32)))
            hidden = gemma2.forward_hidden(
                self.params["lm"], lm, jnp.asarray(bridged.numpy()))
            logits = np.asarray(gemma2.logits_from_hidden(
                self.params["lm"], lm, hidden[:, -1:]))[0, 0]
            nxt = int(logits.argmax())
            ids.append(nxt)
            if nxt == lm.eos_token_id:
                break
        caption = self.language_model.decode_text(
            torch.tensor([ids], dtype=torch.long))[0]
        return caption


@pytest.fixture(scope="module")
def hybrid(ref):
    cfg = _make_cfg()
    torch.manual_seed(0)
    ref_bridge = ref.BridgeLite(
        vision_dim=TINY.vision_dim, language_dim=TINY.language_dim,
        num_blocks=TINY.num_blocks, num_heads_cross=TINY.num_heads_cross,
        num_heads_self=TINY.num_heads_self, dropout=0.0)
    ref_bridge.eval()
    params = {
        "lm": gemma2.init(jax.random.key(1), cfg.lm, dtype=jnp.float32),
        "bridge": bridge_from_state_dict(ref_bridge.state_dict(), TINY),
    }
    return _HybridRefModel(params, cfg, ref_bridge), cfg, params


def test_capture_taps_final_ids(dumper, hybrid):
    model, cfg, _ = hybrid
    rng = np.random.default_rng(3)
    vision = rng.normal(0, 1, (9, TINY.vision_dim)).astype(np.float32)
    ids, caption = dumper.capture_greedy_transcript(model, vision,
                                                    max_length=6)
    assert ids[0] == cfg.lm.bos_token_id
    assert 2 <= len(ids) <= 7
    assert caption == " ".join(str(i) for i in ids)
    # the tap restored the original method
    assert model.language_model.decode_text.__self__.__class__ is _HybridLM


def test_transcript_round_trips_through_our_exact_decode(
        dumper, hybrid, tmp_path):
    """ref-side dump -> our exact-mode greedy decode == token-for-token
    (the `vlm-parity check` predicate, closed offline)."""
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)

    model, cfg, params = hybrid
    rng = np.random.default_rng(11)
    feats = {f"img{i}.npy": rng.normal(0, 1, (9, TINY.vision_dim))
             .astype(np.float32) for i in range(3)}

    out = tmp_path / "ref_transcript.jsonl"
    n = dumper.record_transcripts(
        model, list(feats), out, max_length=6,
        open_image=lambda p: feats[str(p)])
    assert n == 3
    rows = [json.loads(l) for l in out.read_text().splitlines()]

    for row in rows:
        vision = jnp.asarray(feats[row["image_path"]])[None]
        toks, lengths = generate_tokens(
            params, cfg, vision_features=vision,
            gen=GenerationConfig(max_length=6, greedy=True, exact=True),
            activation_dtype=jnp.float32)
        toks, nlen = np.asarray(toks)[0], int(np.asarray(lengths)[0])
        ours = toks[: min(nlen + 1, toks.shape[0])].tolist()
        assert ours == row["tokens"], row["image_path"]


def test_extract_bridge_state_both_layouts(dumper):
    w = torch.ones(2, 2)
    save_model_layout = {"bridge_module_state_dict": {"blocks.0.w": w}}
    trainer_layout = {"model_state_dict": {
        "bridge_module.blocks.0.w": w, "vision_encoder.x": w}}
    bare = {"blocks.0.w": w}
    for ckpt in (save_model_layout, trainer_layout, bare):
        sd = dumper.extract_bridge_state(ckpt)
        assert list(sd) == ["blocks.0.w"]
