"""Config-system tests: presets, YAML round-trip, reference-schema parity."""

import dataclasses

import pytest

from vlm_bridge_tpu.configs import (
    BridgeConfig, DinoV2Config, Gemma2Config, TrainingConfig, VLMConfig)


def test_model_presets():
    d = VLMConfig.default()
    assert d.lm.hidden_size == 2304 and d.vision.hidden_size == 1024
    assert d.bridge.language_dim == d.lm.hidden_size
    assert d.num_vision_tokens == 257

    g = VLMConfig.gemma2_9b()
    assert g.lm.hidden_size == 3584 == g.bridge.language_dim
    assert g.bridge.language_dim % g.bridge.num_heads_self == 0
    assert g.bridge.language_dim % g.bridge.num_heads_cross == 0

    t = VLMConfig.tiny_test()
    assert t.bridge == BridgeConfig.tiny_test()


def test_training_preset_dispatch():
    assert TrainingConfig().model_config() == VLMConfig.default()
    assert (TrainingConfig(model_preset="gemma2_9b").model_config()
            == VLMConfig.gemma2_9b())
    with pytest.raises(ValueError, match="unknown model_preset"):
        TrainingConfig(model_preset="nope").model_config()


def test_yaml_roundtrip_and_unknown_keys(tmp_path):
    tc = TrainingConfig(batch_size=3, learning_rate=2e-5,
                        pad_to_buckets=(32, 64))
    path = tmp_path / "c.yaml"
    tc.to_yaml(path)
    # inject an unknown key (reference semantics: ignored, not an error)
    path.write_text(path.read_text() + "\nnot_a_real_field: 7\n")
    back = TrainingConfig.from_yaml(path)
    assert back.batch_size == 3
    assert back.learning_rate == pytest.approx(2e-5)
    assert back.pad_to_buckets == (32, 64)  # lists -> tuples (hashable)


def test_missing_yaml_gives_defaults(tmp_path):
    assert TrainingConfig.from_yaml(tmp_path / "absent.yaml") == TrainingConfig()


def test_reference_schema_fields_present():
    """Every field of the reference YAML schema must exist
    (reference config/training-default.yaml, training_setup.py:23-67)."""
    names = {f.name for f in dataclasses.fields(TrainingConfig)}
    reference_fields = {
        "batch_size", "num_epochs", "learning_rate", "min_lr",
        "weight_decay", "gradient_clip_val", "use_scheduler",
        "scheduler_type", "use_amp", "amp_dtype", "data_dir", "num_workers",
        "checkpoint_dir", "log_dir", "log_every_n_steps",
        "save_every_n_epochs", "val_every_n_epochs",
        "generate_samples_every_n_epochs", "num_validation_samples",
        "use_early_stopping", "early_stopping_patience",
        "early_stopping_min_delta", "device", "resume_from_checkpoint",
    }
    assert reference_fields <= names


def test_gemma_sliding_alternation():
    cfg = Gemma2Config.gemma2_2b()
    assert cfg.layer_is_sliding(0) and not cfg.layer_is_sliding(1)
    assert cfg.layer_is_sliding(24) and not cfg.layer_is_sliding(25)


def test_dinov2_swiglu_width_formula():
    # HF formula spot checks: giant (1536*4) -> 4096; tiny must stay /8
    assert DinoV2Config.giant().swiglu_hidden == 4096
    tiny = dataclasses.replace(DinoV2Config.tiny_test(), use_swiglu_ffn=True)
    assert tiny.swiglu_hidden % 8 == 0
