"""Close-the-loop training proof: train -> checkpoint -> CORRECT captions.

The reference's evidence that its training loop learns is a val-loss /
perplexity trajectory from a multi-hour A100 run on GroundCap
(reference README.md:297-313) — unreachable offline. The hermetic stand-in
is memorization: overfit the tiny preset on K synthetic image/caption pairs
through the REAL orchestrator (`execute_full_training`: epochs, validation,
best-checkpoint selection), reload the best checkpoint through the REAL
store, and require that greedy `generate_tokens` reproduces every training
caption **token-for-token** — then score the split with the REAL metrics
harness (`evaluate_split`) and require BLEU-4 ~= 1.0.

Two knobs make this reachable at tiny scale, both principled:

- `bridge_causal=True` (TrainingConfig): the reference trains its bridge
  non-causally, which leaks each next token into training position t via
  bridge self-attention — teacher-forced loss converges without the model
  ever learning the autoregressive conditional it is served with (measured
  here: eval loss 0.0015 yet 1/8 captions reproduce). The causal bridge
  makes the trained conditional identical to the KV-cached decode's.
- frozen-head conditioning (`embed_scale`): with the tiny RANDOM-init LM,
  logits = RMSNorm-bounded hidden @ 0.02-std embedding rows, so the maximum
  achievable logit spread is ~1 and cross-entropy has a structural floor of
  ~5.06 nats regardless of the bridge (measured; every LR converges there,
  grad norm -> 0.01). Real Gemma-2 checkpoints have trained embedding norms
  and no such floor. Scaling the frozen embedding init restores the
  assumption the architecture is built on: the frozen head CAN express
  confident distributions.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict


# >=4 words each so corpus BLEU-4 has 4-grams to match (a 2-word caption
# scores bleu4=0 even when reproduced exactly)
CAPTIONS8 = ("a red dog runs by.", "the blue cat sat up!",
             "one green fox hid low?", "a tall tree fell over.",
             "an old boat sank fast.", "my new car drove off!",
             "a wet rock slid down?", "the dry sand blew away.")


def build_memorization_dataset(
    data_dir: str | Path, *, captions=CAPTIONS8, train_repeats: int = 32,
    image_size: int = 224, seed: int = 0,
) -> None:
    """GroundCap-layout dataset of K fixed pairs.

    train/ holds each pair `train_repeats` times (so one epoch is several
    optimizer steps at batch=K); val/ and test/ hold each pair once.
    """
    import numpy as np
    from PIL import Image

    data_dir = Path(data_dir)
    rng = np.random.default_rng(seed)
    images = [
        Image.fromarray(rng.integers(
            0, 256, (image_size, image_size, 3), np.uint8).astype(np.uint8))
        for _ in captions]

    for split, repeats in (("train", train_repeats), ("val", 1), ("test", 1)):
        img_dir = data_dir / split / "images"
        img_dir.mkdir(parents=True, exist_ok=True)
        recs = []
        for i, (img, cap) in enumerate(zip(images, captions)):
            name = f"memo{i:03d}.jpg"
            img.save(img_dir / name, quality=95)
            recs.extend(
                {"image_path": f"images/{name}", "caption": cap,
                 "original_id": f"memo{i:03d}"}
                for _ in range(repeats))
        with open(data_dir / split / "captions.jsonl", "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")


def run_proof(
    workdir: str | Path, *, num_epochs: int = 60, learning_rate: float = 3e-3,
    embed_scale: float = 25.0, captions=CAPTIONS8, max_length: int = 32,
    verbose: bool = True, recipes: tuple = ("bf16",),
) -> Dict[str, object]:
    """Train tiny preset to memorize `captions`; return the proof record.

    Returns a dict with per-caption exact-match results, the best-checkpoint
    val loss, and the evaluate_split metrics (bleu4 etc.). Raises nothing on
    mismatch — callers assert on the fields so failures show the captions.

    recipes: decode recipes to score on the SAME trained checkpoint —
      "bf16"  the unquantized fast path (the original proof)
      "int8"  the full int8 serving recipe (embedding/mlp/attn/bridge int8
              + int8 KV cache), through the fused whole-stack kernels in
              interpret mode on CPU
      "int4"  int8 recipe + nibble-packed int4 MLP weights and int4
              rows-packed embedding/head (the largest-byte-win experiment)
    Quantized recipes give the int8/int4 quality gates a TRAINED-model data
    point instead of Gaussian-init error figures (round-4 verdict next #5);
    they use the tiny_test_wide preset so the fused decode's cache-rows
    precondition holds at the proof's caption length.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlm_bridge_tpu.configs import TrainingConfig
    from vlm_bridge_tpu.data.loader import VLDataset
    from vlm_bridge_tpu.data.preprocess import normalize_on_device
    from vlm_bridge_tpu.data.tokenizer import ByteTokenizer
    from vlm_bridge_tpu.inference.evaluate import evaluate_split
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)
    from vlm_bridge_tpu.training.orchestrator import (
        execute_full_training, prepare_environment)
    from vlm_bridge_tpu.training.stack import init_params

    workdir = Path(workdir)
    data_dir = workdir / "data"
    build_memorization_dataset(data_dir, captions=captions)

    unknown = set(recipes) - {"bf16", "int8", "int4"}
    if unknown:
        raise ValueError(f"unknown recipes: {sorted(unknown)}")
    quantized = [r for r in recipes if r != "bf16"]

    K = len(captions)
    tc = TrainingConfig(
        model_preset="tiny_test_wide" if quantized else "tiny_test",
        data_dir=str(data_dir), batch_size=K,
        num_epochs=num_epochs, learning_rate=learning_rate,
        min_lr=learning_rate, scheduler_type="constant", weight_decay=0.0,
        gradient_clip_val=1.0, loss_chunk_size=16,
        max_text_len=max_length, pad_to_buckets=(max_length,),
        bridge_causal=True,
        use_early_stopping=False, early_stopping_min_delta=0.0,
        generate_samples_every_n_epochs=10 ** 6,  # skip mid-train sampling
        log_every_n_steps=10 ** 6,
        checkpoint_dir=str(workdir / "ckpt"), log_dir=str(workdir / "logs"),
        num_workers=2, seed=0)
    cfg = tc.model_config()

    params = init_params(tc, cfg)
    params["lm"]["embedding"] = params["lm"]["embedding"] * embed_scale

    ctx = prepare_environment(tc, params=params)
    history = execute_full_training(tc, ctx=ctx)

    # reload the BEST slot through the real store (weights-only template)
    restored, meta = ctx.store.load(
        "best", template={"bridge_params": ctx.state.bridge_params})
    proof_params = {**ctx.frozen, "bridge": restored["bridge_params"]}

    # greedy decode of the training images through the production fast path
    ds = VLDataset(data_dir, "test")
    order = {Path(ds.samples[i]["image_path"]).stem: i for i in range(len(ds))}
    idxs = [order[f"memo{i:03d}"] for i in range(K)]
    pixels = np.stack([ds.load_image(i) for i in idxs])
    pv = normalize_on_device(jnp.asarray(pixels), dtype=jnp.bfloat16)
    tok = ByteTokenizer()

    def score(pp, gen, tag):
        toks, lengths = generate_tokens(pp, cfg, pixel_values=pv, gen=gen)
        toks, lengths = np.asarray(toks), np.asarray(lengths)
        results = []
        for i, want in enumerate(captions):
            got = tok.decode([int(x) for x in toks[i][1:lengths[i]]])
            results.append({"want": want, "got": got, "exact": got == want})
            if verbose:
                mark = "OK " if got == want else "MISS"
                print(f"[memorize/{tag} {mark}] want={want!r} got={got!r}")
        eval_out = evaluate_split(
            pp, cfg, data_dir, tokenizer=tok, split="test",
            batch_size=K, gen=gen, verbose=verbose)
        return {
            "captions": results,
            "exact_matches": sum(r["exact"] for r in results),
            "total": K,
            "metrics": eval_out["metrics"],
        }

    def recipe_params_gen(name):
        from vlm_bridge_tpu.models import bridge as bridge_mod
        from vlm_bridge_tpu.models import gemma2

        if name == "bf16":
            return proof_params, GenerationConfig(
                max_length=max_length, greedy=True)
        qbridge = bridge_mod.quantize_decode_params(proof_params["bridge"])
        # sub-channel group must divide the tiny FFN width
        group = 16 if cfg.lm.intermediate_size < 256 else 128
        if name == "int8":
            qlm = gemma2.quantize_params(proof_params["lm"])
            return ({**proof_params, "lm": qlm, "bridge": qbridge},
                    GenerationConfig(max_length=max_length, greedy=True,
                                     kv_quant=True))
        qlm = gemma2.quantize_params(
            proof_params["lm"], parts=("embedding4", "mlp", "attn"))
        return ({**proof_params, "lm": qlm, "bridge": qbridge},
                GenerationConfig(max_length=max_length, greedy=True,
                                 kv_quant=True, mlp_int4=True,
                                 mlp_int4_group=group))

    per_recipe = {}
    for name in recipes:
        if name in per_recipe:
            continue
        pp, gen = recipe_params_gen(name)
        if name == "bf16":
            per_recipe[name] = score(pp, gen, name)
        else:
            # run the REAL fused serving kernels: interpret mode stands in
            # for Mosaic on CPU (same arithmetic, interpreted)
            from vlm_bridge_tpu.ops import decode_kernels

            old = decode_kernels.INTERPRET
            decode_kernels.INTERPRET = True
            try:
                per_recipe[name] = score(pp, gen, name)
            finally:
                decode_kernels.INTERPRET = old

    head = per_recipe[recipes[0]]
    return {
        **head,  # captions/exact_matches/total/metrics of the FIRST recipe
        "best_val_loss": meta.get("val_loss"),
        "final_train_loss": history["history"][-1]["train_loss"]
        if isinstance(history, dict) and history.get("history")
        else None,
        "recipes": per_recipe,
        "model_preset": tc.model_preset,
    }


def main(argv=None) -> int:
    import argparse
    import tempfile

    ap = argparse.ArgumentParser(
        description="train->checkpoint->correct-captions proof (tiny, CPU-ok)")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--recipes", default="bf16",
                    help="comma list of decode recipes to score on the same "
                         "trained checkpoint: bf16,int8,int4 (quantized "
                         "recipes run the fused serving kernels)")
    ap.add_argument("--output", default=None, help="write the JSON record here")
    args = ap.parse_args(argv)

    from vlm_bridge_tpu.tools.loading import apply_platform

    apply_platform(args)
    workdir = args.workdir or tempfile.mkdtemp(prefix="vlm-memorize.")
    record = run_proof(workdir, num_epochs=args.epochs,
                       recipes=tuple(args.recipes.split(",")))
    import jax

    record["backend"] = jax.default_backend()
    line = json.dumps(record)
    print(line)
    if args.output:
        Path(args.output).write_text(line + "\n")
    ok = record["exact_matches"] == record["total"] \
        and record["metrics"]["bleu4"] > 0.99
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
