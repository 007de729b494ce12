"""Eval harness tests: corpus BLEU, CIDEr-D, end-to-end split evaluation.

Metric oracles are hand-computed small cases; the end-to-end test runs the
tiny model over a synthetic on-disk dataset (SURVEY.md §7 stage 9 harness).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlm_bridge_tpu.configs import VLMConfig
from vlm_bridge_tpu.data.groundcap import make_synthetic_dataset
from vlm_bridge_tpu.data.tokenizer import ByteTokenizer
from vlm_bridge_tpu.inference.evaluate import evaluate_split
from vlm_bridge_tpu.inference.generate import GenerationConfig
from vlm_bridge_tpu.inference.metrics import cider_d, corpus_bleu, evaluate_captions
from vlm_bridge_tpu.models import full_model


def test_bleu_perfect_match():
    cands = ["a dog runs fast", "the cat sleeps on the mat"]
    refs = [[c] for c in cands]
    m = corpus_bleu(cands, refs)
    for n in range(1, 5):
        assert m[f"bleu{n}"] == pytest.approx(1.0)
    assert m["brevity_penalty"] == 1.0


def test_bleu_no_overlap():
    m = corpus_bleu(["x y z w"], [["a b c d"]])
    assert m["bleu1"] == 0.0 and m["bleu4"] == 0.0


def test_bleu_hand_computed():
    # candidate: "the the the" vs ref "the cat": clipped unigram = 1 (ref has
    # one "the"), total = 3 -> p1 = 1/3; cand longer than ref -> BP = 1
    m = corpus_bleu(["the the the"], [["the cat"]])
    assert m["bleu1"] == pytest.approx(1 / 3)
    assert m["brevity_penalty"] == 1.0


def test_bleu_brevity_penalty():
    # cand len 2, ref len 4 -> BP = exp(1 - 4/2) = e^-1
    m = corpus_bleu(["a b"], [["a b c d"]])
    assert m["brevity_penalty"] == pytest.approx(math.exp(-1))
    assert m["bleu1"] == pytest.approx(math.exp(-1) * 1.0)


def test_cider_identity_beats_mismatch():
    refs = [["a dog runs in the park"], ["a cat sits on a mat"],
            ["two birds fly over water"]]
    perfect = [r[0] for r in refs]
    wrong = ["purple monkey dishwasher x", "purple monkey dishwasher x",
             "purple monkey dishwasher x"]
    assert cider_d(perfect, refs) > cider_d(wrong, refs)
    assert cider_d(wrong, refs) == pytest.approx(0.0, abs=1e-6)


def test_cider_length_penalty():
    refs = [["a dog runs in the park"]] * 2
    short = ["a dog"]
    exact = ["a dog runs in the park"]
    assert cider_d(exact, refs[:1]) > cider_d(short, refs[:1])


def test_evaluate_captions_keys():
    m = evaluate_captions(["a b c"], [["a b c"]])
    assert {"bleu1", "bleu2", "bleu3", "bleu4", "cider_d",
            "brevity_penalty", "length_ratio"} <= set(m)


def test_evaluate_split_end_to_end(tmp_path):
    make_synthetic_dataset(tmp_path, num_samples=10, image_size=70, seed=0)
    cfg = VLMConfig.tiny_test()
    params = full_model.init(jax.random.key(0), cfg, frozen_dtype=jnp.float32)
    result = evaluate_split(
        params, cfg, tmp_path, tokenizer=ByteTokenizer(), split="train",
        batch_size=3, gen=GenerationConfig(max_length=6, greedy=True),
        activation_dtype=jnp.float32, verbose=False)
    # synthetic 80% split: 8 train samples -> 2 full batches + padded partial
    assert result["num_samples"] == 8
    assert result["captions_per_sec"] > 0
    assert 0.0 <= result["metrics"]["bleu4"] <= 1.0
    assert len(result["samples"]) == 8
    # candidate<->reference pairing must survive the one-batch-deep host
    # pipeline: references come back in dataset order (loader unshuffled)
    from vlm_bridge_tpu.data.loader import VLDataset
    ds = VLDataset(tmp_path, "train")
    assert [ref for _, ref in result["samples"]] == \
        [ds.caption(i) for i in range(8)]


def test_evaluate_split_max_samples(tmp_path):
    make_synthetic_dataset(tmp_path, num_samples=10, image_size=70, seed=0)
    cfg = VLMConfig.tiny_test()
    params = full_model.init(jax.random.key(0), cfg, frozen_dtype=jnp.float32)
    result = evaluate_split(
        params, cfg, tmp_path, tokenizer=ByteTokenizer(), split="train",
        batch_size=4, gen=GenerationConfig(max_length=4, greedy=True),
        max_samples=5, activation_dtype=jnp.float32, verbose=False)
    assert result["num_samples"] == 5


def test_evaluate_split_under_mesh(tmp_path):
    """vlm-eval's mesh path: 8-way batch-sharded decode over the virtual CPU
    mesh must produce the same metrics as the single-device run."""
    from vlm_bridge_tpu.parallel import auto_mesh, shard_params

    make_synthetic_dataset(tmp_path, num_samples=90, image_size=70, seed=3)
    cfg = VLMConfig.tiny_test()
    params = full_model.init(jax.random.key(0), cfg, frozen_dtype=jnp.float32)
    tok = ByteTokenizer()
    gen = GenerationConfig(max_length=5, greedy=True)

    plain = evaluate_split(
        params, cfg, tmp_path, tokenizer=tok, split="test", batch_size=8,
        gen=gen, activation_dtype=jnp.float32, verbose=False)

    mesh = auto_mesh(data=8, model=1, devices=jax.devices()[:8])
    sharded = evaluate_split(
        shard_params(mesh, params), cfg, tmp_path, tokenizer=tok,
        split="test", batch_size=8, gen=gen, activation_dtype=jnp.float32,
        verbose=False, mesh=mesh)

    assert sharded["num_samples"] == plain["num_samples"] > 0
    for k in ("bleu4", "cider_d"):
        assert sharded["metrics"][k] == pytest.approx(plain["metrics"][k])


def test_vlm_eval_cli_mesh_flag(tmp_path, capsys):
    """`vlm-eval --mesh 8` end-to-end on the virtual device mesh."""
    import json

    from vlm_bridge_tpu.inference.evaluate import main

    make_synthetic_dataset(tmp_path / "d", num_samples=60, image_size=70,
                           seed=4)
    out = tmp_path / "result.json"
    rc = main(["--data-dir", str(tmp_path / "d"), "--split", "test",
               "--preset", "tiny", "--platform", "cpu", "--mesh", "8",
               "--batch-size", "8", "--max-length", "5",
               "--max-samples", "8", "--output", str(out)])
    assert rc == 0
    result = json.loads(out.read_text())
    assert result["num_samples"] == 8
    assert "bleu4" in result["metrics"]


def test_vlm_eval_bridge_causal_autodetect(tmp_path, capsys):
    """--exact eval of a bridge_causal-trained checkpoint must pick up the
    causal mask from the trainer's meta sidecar automatically."""
    import json as _json

    from vlm_bridge_tpu.configs import TrainingConfig
    from vlm_bridge_tpu.inference.evaluate import main
    from vlm_bridge_tpu.training import orchestrator

    make_synthetic_dataset(tmp_path / "d", num_samples=40, image_size=70,
                           seed=5)
    import shutil
    shutil.rmtree(tmp_path / "d" / "val")
    shutil.copytree(tmp_path / "d" / "test", tmp_path / "d" / "val")
    tc = TrainingConfig(
        model_preset="tiny_test", data_dir=str(tmp_path / "d"),
        batch_size=4, num_epochs=1, max_steps_per_epoch=2, mesh_shape=(1,),
        max_text_len=32, pad_to_buckets=(16, 32), loss_chunk_size=16,
        checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        bridge_causal=True, num_validation_samples=0,
        generate_samples_every_n_epochs=100)
    orchestrator.execute_full_training(tc)

    out = tmp_path / "r.json"
    rc = main(["--data-dir", str(tmp_path / "d"), "--split", "test",
               "--preset", "tiny", "--platform", "cpu", "--exact",
               "--checkpoint", str(tmp_path / "ckpt" / "latest"),
               "--batch-size", "4", "--max-length", "4",
               "--max-samples", "4", "--output", str(out)])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "causal bridge mask" in stdout
    assert _json.loads(out.read_text())["num_samples"] == 4


def test_vlm_eval_mlp_int4_guards(tmp_path):
    """--mlp-int4 must fail LOUDLY when the fused-stack path cannot serve
    (otherwise the PARITY quality gate would measure int8 and label it
    int4)."""
    from vlm_bridge_tpu.inference.evaluate import main

    make_synthetic_dataset(tmp_path / "d", num_samples=8, image_size=70,
                           seed=7)
    base = ["--data-dir", str(tmp_path / "d"), "--split", "test",
            "--preset", "tiny", "--platform", "cpu", "--batch-size", "4",
            "--max-length", "5", "--mlp-int4"]
    with pytest.raises(SystemExit, match="kv-int8"):
        main(base)  # no --kv-int8
    with pytest.raises(SystemExit, match="Pallas"):
        main(base + ["--kv-int8", "--quantize", "embedding,mlp,attn"])


def test_prestack_decode_params_serves_and_gates(monkeypatch):
    """tools/loading.prestack_decode_params: stacks exactly when the fused
    path would dispatch (r5 eval_e2e regression: per-call stacking +
    memory-gate flicker measured 0.66 captions/s vs ~160 pre-stacked)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlm_bridge_tpu.configs import VLMConfig
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)
    from vlm_bridge_tpu.models import bridge, full_model, gemma2
    from vlm_bridge_tpu.ops import decode_kernels
    from vlm_bridge_tpu.tools.loading import prestack_decode_params

    base = VLMConfig.tiny_test()
    cfg = dataclasses.replace(
        base, lm=dataclasses.replace(base.lm, sliding_window=128))
    params = full_model.init(jax.random.key(3), cfg, frozen_dtype=jnp.float32)
    params["lm"] = gemma2.quantize_params(params["lm"])
    params["bridge"] = bridge.quantize_decode_params(params["bridge"])
    gen = GenerationConfig(max_length=5, greedy=True, kv_quant=True)

    # without the Pallas/interpret path available: no-op
    out = prestack_decode_params(params, cfg, gen)
    assert "stacked_decode" not in out["lm"]

    monkeypatch.setattr(decode_kernels, "INTERPRET", True)
    # exact / non-kv_quant configs: no-op (the fused path cannot dispatch)
    assert "stacked_decode" not in prestack_decode_params(
        params, cfg, GenerationConfig(max_length=5, greedy=True))["lm"]

    vision = full_model.encode_image(params, cfg, jnp.zeros(
        (2, cfg.image_size, cfg.image_size, 3), jnp.float32))
    want, _ = generate_tokens(params, cfg, vision_features=vision, gen=gen,
                              activation_dtype=jnp.float32)

    stacked = prestack_decode_params(params, cfg, gen)
    assert "stacked_decode" in stacked["lm"]
    assert "layers" not in stacked["lm"]
    got, _ = generate_tokens(stacked, cfg, vision_features=vision, gen=gen,
                             activation_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
