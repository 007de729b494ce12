"""Flagship-scale orchestrated training proof on the real TPU.

Round 1 only ever ran the isolated jitted train_step on-chip (bench.py); the
orchestrated loop (BatchLoader -> train -> val -> checkpoint -> resume ->
sample generation) had run at tiny scale on CPU only. This drives
`execute_full_training` with the 2.9B flagship stack on synthetic
GroundCap-layout data and records orchestrated throughput for comparison
against bench.py's isolated-step number (they must agree within ~5% now that
the loop is async).

Phases:
  A. 2 epochs x N steps, validation every epoch, checkpoints, NO sample
     generation (its decode-scan compile is benchmarked separately)
  B. resume from the latest checkpoint for 1 more epoch with sample
     generation ON (proves resume + the in-training generation path at
     flagship scale on-chip)

Writes perf/orchestrated_tpu.json. Run in background with a generous
timeout: full-model compiles through the axon tunnel take 4-9 min each.

Usage: python scripts/tpu_train_proof.py [--steps 200] [--batch 8]
       [--workdir perf/orchestrated] [--skip-phase-b]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--workdir", default="perf/orchestrated")
    ap.add_argument("--num-samples", type=int, default=None,
                    help="synthetic dataset size (default: sized to --steps)")
    ap.add_argument("--skip-phase-b", action="store_true")
    ap.add_argument("--skip-phase-a", action="store_true",
                    help="resume-only: phase A's dataset + checkpoint must "
                         "already exist in --workdir")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--preset", default="default",
                    choices=["default", "tiny_test"])
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from vlm_bridge_tpu.configs import TrainingConfig
    from vlm_bridge_tpu.data.groundcap import make_synthetic_dataset
    from vlm_bridge_tpu.training.orchestrator import (
        execute_full_training, prepare_environment)

    class RecordingWriter:
        """Forwards to the real TB writer while keeping scalars in memory."""

        def __init__(self, inner):
            self.inner = inner
            self.scalars = {}

        def add_scalar(self, tag, value, step):
            self.scalars.setdefault(tag, []).append((step, float(value)))
            self.inner.add_scalar(tag, value, step)

        def add_text(self, tag, text, step):
            self.inner.add_text(tag, text, step)

        def flush(self):
            self.inner.flush()

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    data_dir = work / "data"

    # 80/2/18 split: size the train split to cover --steps batches
    n = args.num_samples or int(args.steps * args.batch / 0.8) + 64
    if not (data_dir / "train" / "captions.jsonl").exists():
        t0 = time.time()
        counts = make_synthetic_dataset(data_dir, num_samples=n,
                                        image_size=224 if args.preset == "default" else 70)
        print(f"synthetic dataset: {counts} in {time.time() - t0:.1f}s",
              flush=True)

    common = dict(
        model_preset=args.preset,
        batch_size=args.batch,
        data_dir=str(data_dir),
        checkpoint_dir=str(work / "ckpt"),
        log_dir=str(work / "logs"),
        max_steps_per_epoch=args.steps,
        max_text_len=args.seq,
        pad_to_buckets=(args.seq,),  # one static shape = bench's [B, seq]
        log_every_n_steps=20,
        num_workers=4,
        num_validation_samples=2,
    )

    out = work / "orchestrated_tpu.json"
    # resume-only reruns must not clobber phase A's recorded numbers
    result = json.loads(out.read_text()) if out.exists() else {}
    result.update({"steps": args.steps, "batch": args.batch, "seq": args.seq,
                   "backend": jax.default_backend()})

    # ---- phase A: fresh 2-epoch run (train + val + ckpt) ----
    if not args.skip_phase_a:
        tc = TrainingConfig(num_epochs=2, generate_samples_every_n_epochs=100,
                            **common)
        ctx = prepare_environment(tc)
        rec = RecordingWriter(ctx.writer)
        ctx.writer = rec
        t0 = time.time()
        r = execute_full_training(tc, ctx=ctx)
        result["phase_a_wall_s"] = time.time() - t0
        result["phase_a_history"] = r["history"]
        result["best_val_loss"] = r["best_val_loss"]

        scalars = rec.scalars
        result["epoch_samples_per_sec"] = [
            v for _, v in scalars.get("epoch/samples_per_sec", [])]
        result["steady_samples_per_sec"] = [
            v for _, v in scalars.get("perf/samples_per_sec_steady", [])]
        result["step_ms_mean"] = [
            v for _, v in scalars.get("perf/step_ms_mean", [])]
        print(f"PHASE A OK: epoch samples/s={result['epoch_samples_per_sec']}, "
              f"steady={result['steady_samples_per_sec']}", flush=True)

        # free phase A's device state BEFORE phase B builds its own stack:
        # two full 2.9B stacks do not fit a 16 GB chip (measured: phase B
        # OOM'd while this result dict still pinned ctx.frozen)
        import gc

        del r, ctx, rec, scalars
        gc.collect()

    # ---- phase B: resume + sample generation at flagship scale ----
    if not args.skip_phase_b:
        tc_b = TrainingConfig(num_epochs=3, generate_samples_every_n_epochs=1,
                              resume_from_checkpoint="latest",
                              validation_strategy_sweep=False, **common)
        t0 = time.time()
        r_b = execute_full_training(tc_b)
        result["phase_b_wall_s"] = time.time() - t0
        result["phase_b_history"] = r_b["history"]
        assert r_b["history"][0]["epoch"] == 2, "resume must continue at epoch 2"
        print(f"PHASE B OK: resumed epoch {r_b['history'][0]['epoch']}, "
              f"wall {result['phase_b_wall_s']:.0f}s", flush=True)

    out.write_text(json.dumps(result, indent=2, default=float))
    print(f"PROOF OK -> {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
