"""Training stack tests on a synthetic dataset + tiny model:
one real train epoch (loss decreases on repeated data), validation epoch,
checkpoint save/resume round-trip, early stopping, full mini run, TB events.
(Reference test strategy: test_training_strategy.py — tiny real runs with
truncated loaders, no mocks.)
"""

import dataclasses
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vlm_bridge_tpu.configs import TrainingConfig
from vlm_bridge_tpu.data import groundcap
from vlm_bridge_tpu.runtime.tb_writer import read_events
from vlm_bridge_tpu.training import orchestrator
from vlm_bridge_tpu.training.train_step import (
    make_schedule, init_train_state, make_train_step, split_frozen)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gc")
    groundcap.make_synthetic_dataset(d, num_samples=40, image_size=70)
    # synthetic split: 32 train / 0 val / 8 test -> give val some data
    import shutil
    shutil.rmtree(d / "val")
    shutil.copytree(d / "test", d / "val")
    return d


def make_tc(data_dir, tmp_path, **kw) -> TrainingConfig:
    defaults = dict(
        batch_size=4, num_epochs=1, data_dir=str(data_dir),
        checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        model_preset="tiny_test", max_text_len=32, pad_to_buckets=(16, 32),
        num_workers=2, log_every_n_steps=1, max_steps_per_epoch=4,
        num_validation_samples=1, loss_chunk_size=16,
        mesh_shape=(4,),  # 4-way data parallel over the virtual CPU devices
    )
    defaults.update(kw)
    return TrainingConfig(**defaults)


def test_schedules():
    tc = TrainingConfig(learning_rate=1e-5, min_lr=1e-6, num_epochs=2)
    s = make_schedule(tc, steps_per_epoch=10)
    assert float(s(0)) == pytest.approx(1e-5)
    assert float(s(20)) == pytest.approx(1e-6, rel=1e-3)
    tc2 = dataclasses.replace(tc, scheduler_type="linear")
    s2 = make_schedule(tc2, 10)
    assert float(s2(10)) == pytest.approx((1e-5 + 1e-6) / 2, rel=1e-3)
    tc3 = dataclasses.replace(tc, use_scheduler=False)
    assert float(make_schedule(tc3, 10)(15)) == pytest.approx(1e-5)


@pytest.mark.slow
def test_train_step_decreases_loss_on_fixed_batch(data_dir, tmp_path):
    """Overfit one batch for a few steps: the bridge must learn."""
    tc = make_tc(data_dir, tmp_path, learning_rate=3e-3, min_lr=3e-3,
                 use_scheduler=False)
    ctx = orchestrator.prepare_environment(tc, activation_dtype=jnp.float32)
    batch = next(iter(ctx.train_loader))
    from vlm_bridge_tpu.parallel import shard_batch

    dev_batch = shard_batch(ctx.mesh, batch)
    losses = []
    for i in range(6):
        ctx.state, metrics = ctx.train_step(
            ctx.state, ctx.frozen, dev_batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert float(metrics["grad_norm_before_clip"]) > 0
    assert losses[-1] < losses[0] - 0.05, losses


@pytest.mark.slow
def test_full_training_run_and_artifacts(data_dir, tmp_path):
    tc = make_tc(data_dir, tmp_path, num_epochs=2)
    result = orchestrator.execute_full_training(tc)
    assert result["epochs_run"] == 2
    assert math.isfinite(result["best_val_loss"])

    # checkpoint slots written
    ckpt = tmp_path / "ckpt"
    assert (ckpt / "latest").exists()
    assert (ckpt / "best").exists()
    assert (ckpt / "best_weights_only").exists()

    # TB event file exists and parses with valid CRCs
    events = list((tmp_path / "logs").glob("events.out.tfevents.*"))
    assert events
    payloads = list(read_events(events[0]))
    assert len(payloads) > 5


@pytest.mark.slow
def test_resume_restores_counters(data_dir, tmp_path):
    tc = make_tc(data_dir, tmp_path, num_epochs=1)
    r1 = orchestrator.execute_full_training(tc)
    step_after = int(r1["ctx"].state.step)
    assert step_after > 0

    tc2 = make_tc(data_dir, tmp_path, num_epochs=2)
    tc2.resume_from_checkpoint = "latest"
    ctx2 = orchestrator.prepare_environment(tc2, activation_dtype=jnp.float32)
    orchestrator.load_checkpoint(ctx2, "latest")
    assert ctx2.start_epoch == 1
    assert int(ctx2.state.step) == step_after
    # params restored identically
    r1_params = jax.device_get(r1["ctx"].state.bridge_params)
    r2_params = jax.device_get(ctx2.state.bridge_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        r1_params, r2_params)


@pytest.mark.slow
def test_early_stopping(data_dir, tmp_path):
    """lr=0 -> no improvement -> stops after patience+1 validations."""
    tc = make_tc(data_dir, tmp_path, num_epochs=8, learning_rate=0.0,
                 min_lr=0.0, use_scheduler=False,
                 early_stopping_patience=2, early_stopping_min_delta=0.0)
    result = orchestrator.execute_full_training(tc)
    # epoch 1 sets best; epochs 2,3 fail to improve by >min_delta... with
    # min_delta=0 and identical loss, counter hits 2 at epoch 3
    assert result["epochs_run"] <= 4


def test_simple_bleu4():
    assert orchestrator.simple_bleu4("a b c d e", "a b c d e") == pytest.approx(1.0)
    assert orchestrator.simple_bleu4("x y z w q", "a b c d e") == 0.0
    partial = orchestrator.simple_bleu4("a b c d x", "a b c d e")
    assert 0.0 < partial < 1.0


@pytest.mark.slow
def test_gradient_accumulation_matches_full_batch():
    """k microbatches with MultiSteps == one full-batch step (same per-token
    loss weighting: uniform lengths)."""
    import jax
    import jax.numpy as jnp

    from vlm_bridge_tpu.configs import TrainingConfig, VLMConfig
    from vlm_bridge_tpu.models import full_model
    from vlm_bridge_tpu.training.train_step import (
        init_train_state, make_schedule, make_train_step, split_frozen)

    cfg = VLMConfig.tiny_test()
    B, T = 4, 8
    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": rng.integers(
            0, 256, (B, cfg.image_size, cfg.image_size, 3), np.uint8),
        "input_ids": rng.integers(3, cfg.lm.vocab_size, (B, T)).astype(np.int32),
        "attn_mask": np.ones((B, T), np.int32),
    }
    params = full_model.init(jax.random.key(0), cfg, frozen_dtype=jnp.float32)
    frozen = split_frozen(params)
    key = jax.random.key(9)

    def run(tc, batches):
        # fresh copies: the train step donates its state buffers
        fresh = jax.tree.map(jnp.copy, params)
        state, opt = init_train_state(fresh, tc, steps_per_epoch=10)
        step = make_train_step(cfg, tc, opt, make_schedule(tc, 10),
                               activation_dtype=jnp.float32)
        for b in batches:
            state, metrics = step(state, frozen, b, key)
        return state

    tc_full = TrainingConfig(model_preset="tiny_test", batch_size=B,
                             loss_chunk_size=8)
    s_full = run(tc_full, [batch])

    tc_acc = TrainingConfig(model_preset="tiny_test", batch_size=B // 2,
                            loss_chunk_size=8, gradient_accumulation_steps=2)
    halves = [{k: v[:2] for k, v in batch.items()},
              {k: v[2:] for k, v in batch.items()}]
    s_acc = run(tc_acc, halves)

    for a, b in zip(jax.tree.leaves(s_full.bridge_params),
                    jax.tree.leaves(s_acc.bridge_params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_empty_val_split_does_not_early_stop(tmp_path):
    """An empty val loader yields nan val loss, which must not feed early
    stopping (it used to return inf and kill runs after `patience` epochs)."""
    from vlm_bridge_tpu.configs import TrainingConfig
    from vlm_bridge_tpu.data.groundcap import make_synthetic_dataset
    from vlm_bridge_tpu.training.orchestrator import execute_full_training

    # 8 samples -> val split is empty after the 80/2/18 split
    make_synthetic_dataset(tmp_path / "data", num_samples=8, image_size=70,
                           seed=0)
    tc = TrainingConfig(
        model_preset="tiny_test", data_dir=str(tmp_path / "data"),
        batch_size=2, num_epochs=5, max_steps_per_epoch=1, mesh_shape=(2,),
        checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        num_workers=0, early_stopping_patience=2, use_early_stopping=True,
        generate_samples_every_n_epochs=100)
    result = execute_full_training(tc)
    # all 5 epochs ran — nan val loss never tripped the patience counter
    assert result["epochs_run"] == 5


def test_validation_samples_under_tp_mesh(data_dir, tmp_path):
    """The in-training sample generator must work when the context mesh has a
    model axis (TP-sharded frozen LM) and num_validation_samples does not
    divide the data axis (round-1 gap: this path was untested under model>1)."""
    tc = make_tc(data_dir, tmp_path, mesh_shape=(4, 2),
                 num_validation_samples=3)
    ctx = orchestrator.prepare_environment(tc, activation_dtype=jnp.float32)
    orchestrator.generate_validation_samples(ctx, epoch=0)
    from vlm_bridge_tpu.runtime.tb_writer import read_events

    ctx.writer.flush()
    events = list((tmp_path / "logs").glob("events.out.tfevents.*"))
    assert events and len(list(read_events(events[0]))) > 3


def test_precache_pixels_builds_and_attaches(tmp_path):
    """precache_pixels=True must materialize the uint8 pixel cache for
    train+val at environment prep, and the loaders must stream from it."""
    groundcap.make_synthetic_dataset(tmp_path / "data", num_samples=40,
                                     image_size=70, seed=2)
    import shutil
    shutil.rmtree(tmp_path / "data" / "val")
    shutil.copytree(tmp_path / "data" / "test", tmp_path / "data" / "val")

    tc = make_tc(tmp_path / "data", tmp_path, precache_pixels=True)
    ctx = orchestrator.prepare_environment(tc, activation_dtype=jnp.float32)
    for split in ("train", "val"):
        assert (tmp_path / "data" / split / "pixels_u8.npy").exists()
    assert ctx.train_loader.ds.pixels is not None
    assert ctx.val_loader.ds.pixels is not None
    # batches come out identical to the JPEG-decode path
    from vlm_bridge_tpu.data.loader import VLDataset
    cold = VLDataset(tmp_path / "data", "train", pixel_cache="off")
    b = ctx.train_loader.first_batch()
    np.testing.assert_array_equal(
        b["pixel_values"][0], cold.decode_image(0))
