"""Training orchestration: epoch loop, validation, early stopping,
checkpoint/resume, sample generation with BLEU, TensorBoard logging.

Replaces the reference orchestrator + loops
(reference: src/vlm_bridge/training_strategy/training_orchestrator.py:13-193,
core_training_loop.py:16-402) with a mesh-aware JAX implementation. Metric
tags, checkpoint slots, early-stopping semantics (patience 3, min-delta 0.01)
and the KeyboardInterrupt -> emergency checkpoint behavior are preserved.
"""

from __future__ import annotations

import math
import time
from collections import Counter
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vlm_bridge_tpu.configs import TrainingConfig, VLMConfig
from vlm_bridge_tpu.data.loader import get_data_loaders
from vlm_bridge_tpu.data.tokenizer import get_tokenizer
from vlm_bridge_tpu.inference.generate import GenerationConfig, generate_tokens
from vlm_bridge_tpu.models import full_model
from vlm_bridge_tpu.parallel import shard_batch
from vlm_bridge_tpu.runtime.checkpoint import CheckpointStore
from vlm_bridge_tpu.runtime.profiling import StepProfiler
from vlm_bridge_tpu.runtime.tb_writer import SummaryWriter
from vlm_bridge_tpu.training.stack import build_stack
from vlm_bridge_tpu.training.train_step import TrainState


@dataclass
class TrainingContext:
    """Everything the loops need (reference TrainingContext,
    training_setup.py:99-115)."""

    tc: TrainingConfig
    cfg: VLMConfig
    mesh: Any
    frozen: dict
    state: TrainState
    opt: Any
    schedule: Any
    train_loader: Any
    val_loader: Any
    tokenizer: Any
    writer: SummaryWriter
    store: CheckpointStore
    train_step: Any
    eval_step: Any
    start_epoch: int = 0
    best_val_loss: float = float("inf")
    early_stop_counter: int = 0
    activation_dtype: Any = jnp.bfloat16


def prepare_environment(
    tc: TrainingConfig,
    *,
    params: Optional[dict] = None,
    tokenizer=None,
    mesh=None,
    activation_dtype=None,
) -> TrainingContext:
    """Build the full training context (reference prepare_environment,
    training_setup.py:118-188): model + loaders + optimizer + logging.

    The init->shard->jit half lives in training/stack.build_stack (shared
    with bench.py and the multichip dryrun); this adds loaders + logging.

    activation_dtype=None derives from the reference-compatible use_amp/
    amp_dtype config fields (bf16 under AMP — fp16 maps to bf16 on TPU —
    else f32)."""
    if tokenizer is None:
        tokenizer = get_tokenizer(tc.tokenizer_path)

    if tc.precache_pixels:
        # one-time per split: after this every epoch streams a memmap
        # instead of re-decoding every JPEG (reference data_loader.py:118).
        # EVERY process builds its own missing cache — TPU pod hosts have
        # local disks, so process 0's build would not exist on hosts 1..N.
        # On a shared filesystem concurrent builds are benign: the build
        # goes through a temp file + atomic rename and all hosts derive
        # identical content. Barrier before loader construction so no
        # process attaches a half-ready view.
        from vlm_bridge_tpu.data.loader import VLDataset
        from vlm_bridge_tpu.data.pixel_cache import build_pixel_cache

        for split in ("train", "val"):
            ds = VLDataset(tc.data_dir, split)
            if ds.pixels is None and len(ds):
                print(f"[data] building pixel cache for {split} "
                      f"({len(ds)} images)...", flush=True)
                build_pixel_cache(ds, num_workers=tc.num_workers)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("pixel_cache_built")

    train_loader, val_loader, _ = get_data_loaders(
        tc.data_dir, batch_size=tc.batch_size, tokenizer=tokenizer,
        max_text_len=tc.max_text_len, buckets=tc.pad_to_buckets,
        num_workers=tc.num_workers, seed=tc.seed)
    steps_per_epoch = len(train_loader)
    if tc.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, tc.max_steps_per_epoch)
    print(f"[data] train pixel source: "
          f"{'memmap cache' if train_loader.ds.pixels is not None else 'JPEG decode'}",
          flush=True)

    stack = build_stack(
        tc, params=params, mesh=mesh, steps_per_epoch=steps_per_epoch,
        activation_dtype=activation_dtype)

    # multi-host: only process 0 writes events/checkpoints (the store's
    # rmtree+rename slot swap is not multi-writer safe)
    if jax.process_index() == 0:
        writer = SummaryWriter(tc.log_dir)
        writer.add_text("config", "```\n" + "\n".join(
            f"{k}: {v}" for k, v in sorted(vars(tc).items())) + "\n```", 0)
    else:
        from vlm_bridge_tpu.runtime.tb_writer import NullWriter

        writer = NullWriter()
    store = CheckpointStore(tc.checkpoint_dir)

    return TrainingContext(
        tc=tc, cfg=stack.cfg, mesh=stack.mesh, frozen=stack.frozen,
        state=stack.state, opt=stack.opt, schedule=stack.schedule,
        train_loader=train_loader, val_loader=val_loader,
        tokenizer=tokenizer, writer=writer, store=store,
        train_step=stack.train_step, eval_step=stack.eval_step,
        activation_dtype=stack.activation_dtype)


# ---------------------------------------------------------------------------
# Checkpoint save / load
# ---------------------------------------------------------------------------


def save_checkpoint(ctx: TrainingContext, epoch: int, val_loss: float,
                    is_best: bool) -> None:
    # every process calls save; the store coordinates (orbax barriers
    # internally and only the primary host touches the filesystem — see
    # CheckpointStore.save). The built-in barrier also keeps non-writer
    # ranks from racing into an early-stop exit mid-write.
    meta = {
        "epoch": epoch,
        "step": int(ctx.state.step),
        "val_loss": float(val_loss),
        "best_val_loss": float(ctx.best_val_loss),
        "early_stop_counter": ctx.early_stop_counter,
        # serving needs to know which conditional was trained: exact-mode
        # eval of a causal-trained bridge must mask causally too
        "bridge_causal": bool(ctx.tc.bridge_causal),
    }
    ctx.store.save("latest", bridge_params=ctx.state.bridge_params,
                   opt_state=ctx.state.opt_state, meta=meta)
    if is_best:
        ctx.store.save("best", bridge_params=ctx.state.bridge_params,
                       opt_state=ctx.state.opt_state, meta=meta)
        ctx.store.save("best_weights_only",
                       bridge_params=ctx.state.bridge_params, meta=meta)


def load_checkpoint(ctx: TrainingContext, slot: str = "latest") -> None:
    """Restore state + counters in place (reference load_checkpoint,
    training_orchestrator.py:159-193)."""
    template = {"bridge_params": ctx.state.bridge_params,
                "opt_state": ctx.state.opt_state}
    restored, meta = ctx.store.load(slot, template=template)
    ctx.state = TrainState(
        step=jnp.asarray(meta.get("step", 0), jnp.int32),
        bridge_params=jax.device_put(restored["bridge_params"]),
        opt_state=jax.device_put(restored["opt_state"]),
    )
    ctx.start_epoch = meta.get("epoch", -1) + 1
    ctx.best_val_loss = meta.get("best_val_loss", float("inf"))
    ctx.early_stop_counter = meta.get("early_stop_counter", 0)


# ---------------------------------------------------------------------------
# Epoch loops
# ---------------------------------------------------------------------------


def run_training_epoch(ctx: TrainingContext, epoch: int) -> float:
    """Async dispatch loop: the ONLY device syncs are the host readback of
    the metrics dict every `log_every_n_steps` and one bulk loss fetch at
    epoch end. The round-1 loop synced every step (`int(state.step)` for the
    RNG fold-in + a blocking loss read), serializing dispatch against device
    execution; the fold-in now happens in-graph (train_step.py) and logging
    gates on a host-side step counter."""
    tc = ctx.tc
    t_epoch = time.time()
    prof = StepProfiler(
        trace_dir=tc.profile_trace_dir if epoch == 0 else None,
        start_step=tc.profile_start_step, num_steps=tc.profile_num_steps)
    base_rng = jax.random.key(tc.seed + 1)
    host_step = int(ctx.state.step)  # one sync per epoch, not per step
    losses: List[jax.Array] = []     # device scalars; fetched once at the end
    n = 0
    # fenced-window timing: windows between metric readbacks measure true
    # device throughput; the first window (jit compile) is skipped
    t_fence, n_fence, fences = time.time(), 0, 0
    for batch_idx, batch in enumerate(ctx.train_loader):
        if tc.max_steps_per_epoch and batch_idx >= tc.max_steps_per_epoch:
            break
        dev_batch = shard_batch(ctx.mesh, batch)
        with prof.step(record_time=False), ctx.mesh:
            ctx.state, metrics = ctx.train_step(
                ctx.state, ctx.frozen, dev_batch, base_rng)
        host_step += 1
        losses.append(metrics["loss"])
        n += 1
        if host_step % tc.log_every_n_steps == 0:
            m = jax.device_get(metrics)  # the fence
            now = time.time()
            if fences > 0:
                prof.add_window(n - n_fence, now - t_fence)
            t_fence, n_fence, fences = now, n, fences + 1
            ctx.writer.add_scalar("train/loss", float(m["loss"]), host_step)
            ctx.writer.add_scalar(
                "train/learning_rate", float(m["learning_rate"]), host_step)
            ctx.writer.add_scalar(
                "train/grad_norm_before_clip",
                float(m["grad_norm_before_clip"]), host_step)
    loss_vals = [float(x) for x in jax.device_get(losses)] if losses else []
    prof.close()
    avg = sum(loss_vals) / max(len(loss_vals), 1)
    dt = time.time() - t_epoch
    sps = n * tc.batch_size / max(dt, 1e-9)
    ctx.writer.add_scalar("epoch/train_loss", avg, epoch)
    summary = prof.summary()
    steady = (1000.0 * tc.batch_size / summary["step_ms_mean"]
              if "step_ms_mean" in summary else None)
    # epoch/samples_per_sec keeps its historical wall-clock meaning (so runs
    # graphed before/after this version line up); the steady-state rate —
    # which excludes epoch 0's jit compile (3.1 vs 38.2 samples/s on v5e) —
    # gets its own tag for users who want the representative number.
    ctx.writer.add_scalar("epoch/samples_per_sec", sps, epoch)
    if steady is not None:
        ctx.writer.add_scalar("epoch/samples_per_sec_steady", steady, epoch)
    for k, v in summary.items():
        ctx.writer.add_scalar(f"perf/{k}", v, epoch)
    if steady is not None:
        ctx.writer.add_scalar("perf/samples_per_sec_steady", steady, epoch)
    print(f"[Train] epoch {epoch + 1}: loss {avg:.4f} "
          f"({n} steps, {sps:.2f} samples/s)")
    return avg


def run_validation_epoch(ctx: TrainingContext, epoch: int) -> float:
    tc = ctx.tc
    batch_losses: List[jax.Array] = []  # device scalars; one fetch at the end
    n = 0
    total_len, total_samples = 0.0, 0
    unique_tokens: set = set()
    total_tokens = 0
    for batch in ctx.val_loader:
        dev_batch = shard_batch(ctx.mesh, batch)
        with ctx.mesh:
            m = ctx.eval_step(ctx.frozen, ctx.state.bridge_params, dev_batch)
        batch_losses.append(m["loss"])
        n += 1
        mask = batch["attn_mask"].astype(bool)
        total_len += batch["attn_mask"].sum()
        total_samples += batch["attn_mask"].shape[0]
        valid = batch["input_ids"][mask]
        unique_tokens.update(valid.tolist())
        total_tokens += valid.size
    if n == 0:
        # nan = "no validation happened"; callers must not treat this as a
        # bad epoch (inf here used to trip early stopping on empty loaders)
        print("[Validation] WARNING: empty val loader — skipping validation")
        return float("nan")
    avg = float(sum(float(x) for x in jax.device_get(batch_losses))) / n
    ppl = math.exp(min(avg, 50.0))
    ctx.writer.add_scalar("val/loss", avg, epoch)
    ctx.writer.add_scalar("val/perplexity", ppl, epoch)
    ctx.writer.add_scalar(
        "val/avg_sequence_length", total_len / max(total_samples, 1), epoch)
    ctx.writer.add_scalar(
        "val/token_diversity", len(unique_tokens) / max(total_tokens, 1), epoch)
    print(f"[Validation] epoch {epoch + 1}: loss {avg:.4f}, ppl {ppl:.2f}")

    if (epoch + 1) % tc.generate_samples_every_n_epochs == 0:
        generate_validation_samples(ctx, epoch)
    return avg


# ---------------------------------------------------------------------------
# Sample generation + BLEU
# ---------------------------------------------------------------------------


def simple_bleu4(candidate: str, reference: str) -> float:
    """Sentence BLEU-4 with brevity penalty and uniform n-gram weights
    (reference _calculate_simple_bleu4, core_training_loop.py:405-462)."""
    cand = candidate.lower().split()
    ref = reference.lower().split()
    if not cand or not ref:
        return 0.0
    log_precisions = []
    for order in range(1, 5):
        c_ngrams = Counter(
            tuple(cand[i:i + order]) for i in range(len(cand) - order + 1))
        r_ngrams = Counter(
            tuple(ref[i:i + order]) for i in range(len(ref) - order + 1))
        overlap = sum((c_ngrams & r_ngrams).values())
        total = max(sum(c_ngrams.values()), 1)
        if overlap == 0:
            return 0.0
        log_precisions.append(math.log(overlap / total))
    bp = 1.0 if len(cand) > len(ref) else math.exp(1 - len(ref) / max(len(cand), 1))
    return bp * math.exp(sum(log_precisions) / 4)


def generate_validation_samples(ctx: TrainingContext, epoch: int) -> None:
    """Caption the first val batch, log text + BLEU to TB (reference
    _generate_validation_samples, core_training_loop.py:257-402)."""
    tc = ctx.tc
    # first_batch() avoids leaking the prefetch producer thread that
    # abandoning a `next(iter(loader))` generator leaves behind until GC
    batch = ctx.val_loader.first_batch()
    if batch is None:
        return
    k = min(tc.num_validation_samples, batch["pixel_values"].shape[0])
    params = {**ctx.frozen, "bridge": jax.tree.map(
        lambda p: p.astype(ctx.activation_dtype), ctx.state.bridge_params)}
    from vlm_bridge_tpu.data.preprocess import normalize_on_device, pad_to_batch

    # pad the sample batch to a multiple of the mesh "data" axis so the
    # batch-sharded decode divides evenly (params are already mesh-sharded,
    # incl. tensor-parallel LM weights when model > 1)
    data_ax = dict(zip(ctx.mesh.axis_names, ctx.mesh.devices.shape)).get("data", 1)
    k_pad = -(-k // max(data_ax, 1)) * max(data_ax, 1)
    pixels_np = pad_to_batch(batch["pixel_values"][:k], k_pad)
    with ctx.mesh:
        pixels = normalize_on_device(
            jnp.asarray(pixels_np), dtype=ctx.activation_dtype)
    toks, lengths = generate_tokens(
        params, ctx.cfg, pixel_values=pixels,
        rng=jax.random.key(epoch),
        gen=GenerationConfig(max_length=50, temperature=0.7, top_p=0.9),
        activation_dtype=ctx.activation_dtype, mesh=ctx.mesh)
    toks = np.asarray(toks)[:k]
    bleus, lens, all_words = [], [], []
    for i in range(k):
        text = ctx.tokenizer.decode(toks[i].tolist())
        ref_caption = batch["captions"][i]
        bleu = simple_bleu4(text, ref_caption)
        bleus.append(bleu)
        words = text.split()
        lens.append(len(words))
        all_words.extend(words)
        ctx.writer.add_text(
            f"val/sample_{i}",
            f"**generated:** {text}\n\n**reference:** {ref_caption}\n\n"
            f"**bleu4:** {bleu:.4f}", epoch)
    if bleus:
        ctx.writer.add_scalar("val/sample_bleu_avg", float(np.mean(bleus)), epoch)
        ctx.writer.add_scalar("val/sample_length_avg", float(np.mean(lens)), epoch)
        ctx.writer.add_scalar(
            "val/sample_diversity",
            len(set(all_words)) / max(len(all_words), 1), epoch)

    # robust strategy sweep on the first sample (reference runs primary +
    # fallback strategies per epoch, core_training_loop.py:295-319).
    # Off by default: 5 strategies = 5 extra jit traces at a batch-1 shape.
    if tc.validation_strategy_sweep and k > 0:
        from vlm_bridge_tpu.inference.robust import generate_caption_robust

        sweep = generate_caption_robust(
            params, ctx.cfg, pixels[:1], ctx.tokenizer,
            rng=jax.random.key(epoch + 1), max_length=50,
            activation_dtype=ctx.activation_dtype)
        body = "\n\n".join(
            f"**{name}:** {cap}" for name, cap in sweep["results"].items())
        ctx.writer.add_text(
            "val/strategy_sweep",
            body + f"\n\n**chosen:** {sweep['chosen']}", epoch)


# ---------------------------------------------------------------------------
# Full training
# ---------------------------------------------------------------------------


def execute_full_training(
    tc: TrainingConfig, *, ctx: Optional[TrainingContext] = None,
) -> Dict[str, Any]:
    """Epoch loop with resume, best tracking, early stopping, emergency
    checkpoint on KeyboardInterrupt (reference execute_full_training,
    training_orchestrator.py:13-101)."""
    if ctx is None:
        ctx = prepare_environment(tc)
    if tc.resume_from_checkpoint:
        load_checkpoint(ctx, tc.resume_from_checkpoint)
        print(f"resumed from epoch {ctx.start_epoch}")

    history: List[Dict[str, float]] = []
    epoch = ctx.start_epoch  # bound for the emergency-checkpoint path
    try:
        for epoch in range(ctx.start_epoch, tc.num_epochs):
            train_loss = run_training_epoch(ctx, epoch)
            val_loss = float("nan")
            if (epoch + 1) % tc.val_every_n_epochs == 0:
                val_loss = run_validation_epoch(ctx, epoch)
            if math.isfinite(val_loss):
                improved = val_loss < ctx.best_val_loss - tc.early_stopping_min_delta
                if improved:
                    ctx.best_val_loss = val_loss
                    ctx.early_stop_counter = 0
                else:
                    ctx.early_stop_counter += 1
            else:
                # no validation this epoch (interval or empty loader):
                # neither an improvement nor a strike against early stopping
                improved = False
            if (epoch + 1) % tc.save_every_n_epochs == 0:
                save_checkpoint(ctx, epoch, val_loss, improved)
            history.append({"epoch": epoch, "train_loss": train_loss,
                            "val_loss": val_loss})
            if (tc.use_early_stopping
                    and ctx.early_stop_counter >= tc.early_stopping_patience):
                print(f"early stopping at epoch {epoch + 1}")
                break
    except KeyboardInterrupt:
        print("interrupted — writing emergency checkpoint")
        save_checkpoint(ctx, epoch, float("nan"), False)
        raise
    finally:
        ctx.writer.flush()

    return {"history": history, "best_val_loss": ctx.best_val_loss,
            "epochs_run": len(history), "ctx": ctx}
