"""Record a token transcript FROM THE REFERENCE model for `vlm-parity check`.

The north-star parity proof is token-for-token caption reproduction from
converted weights. Our side is one command (`vlm-parity check`); this script
is the reference side: it imports the reference's own FullModel
(reference: src/vlm_bridge/model_architecture/full_model.py:191-386), runs
greedy `generate_caption` per image, and writes the JSONL transcript that
`vlm-parity check --transcript ...` consumes.

Token capture is a tap, not a copy: the reference's non-debug generation
calls `language_model.decode_text(input_ids)` exactly once, at the end, with
the full BOS..EOS id sequence (full_model.py:376) — wrapping that method
records the ids without reimplementing any reference logic.

Checkpoint loading accepts BOTH reference on-disk formats (SURVEY §2 note 1:
the trainer writes {"model_state_dict": {"bridge_module.<k>": ...}}
(training_orchestrator.py:114-125) while FullModel.load_model expects
{"bridge_module_state_dict": {<k>: ...}} (full_model.py:463-471)).

Needs network/HF weights for DINOv2+Gemma (the reference wraps HF hub
models), so it cannot run in this zero-egress environment; the transcript-
writing half is exercised offline by tests/test_ref_transcript.py with the
tiny hybrid oracle from tests/test_reference_oracle.py.

Usage (on a machine with the reference installed + weights):
  python scripts/ref_record_transcript.py IMG [IMG...] \
      --checkpoint checkpoints/best_model.pth --output ref_transcript.jsonl
  # then, here:
  vlm-parity check --transcript ref_transcript.jsonl --pth best_model.pth
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def capture_greedy_transcript(model, image, max_length: int = 50):
    """Run the reference greedy generation once; return (ids, caption).

    `model` is anything with the reference FullModel surface:
    `.generate_caption(image, max_length=, do_sample=, temperature=)` that
    finishes with exactly one `.language_model.decode_text(input_ids)` call.
    """
    captured = {}
    lm = model.language_model
    orig = lm.decode_text

    def tap(input_ids, *a, **k):
        try:
            ids = input_ids.detach().cpu().reshape(-1).tolist()
        except AttributeError:  # already array-like
            ids = [int(t) for t in list(input_ids)[0]] if hasattr(
                input_ids[0], "__iter__") else [int(t) for t in input_ids]
        captured["ids"] = [int(t) for t in ids]
        return orig(input_ids, *a, **k)

    lm.decode_text = tap
    try:
        # greedy: do_sample=False takes the argmax branch (full_model.py:350)
        caption = model.generate_caption(
            image, max_length=max_length, do_sample=False, temperature=1.0)
    finally:
        lm.decode_text = orig
    if "ids" not in captured:
        raise RuntimeError(
            "generate_caption finished without calling decode_text — "
            "reference code path changed; update the tap")
    return captured["ids"], caption


def record_transcripts(model, image_paths, out_path, max_length=50,
                       open_image=None):
    """Write the vlm-parity JSONL for each image path. Returns row count."""
    if open_image is None:
        from PIL import Image

        def open_image(p):
            return Image.open(p).convert("RGB")

    out_path = Path(out_path)
    n = 0
    with out_path.open("w") as f:
        for p in image_paths:
            ids, caption = capture_greedy_transcript(
                model, open_image(p), max_length=max_length)
            f.write(json.dumps({"image_path": str(p), "tokens": ids,
                                "caption": caption}) + "\n")
            n += 1
            print(f"recorded {p}: {len(ids)} tokens: {caption[:60]!r}")
    print(f"wrote {n} rows -> {out_path}")
    return n


def extract_bridge_state(ckpt: dict) -> dict:
    """Unprefixed bridge state-dict from either reference on-disk layout."""
    if "bridge_module_state_dict" in ckpt:           # FullModel.save_model
        return ckpt["bridge_module_state_dict"]
    if "model_state_dict" in ckpt:                   # trainer save_checkpoint
        return {k.split("bridge_module.", 1)[1]: v
                for k, v in ckpt["model_state_dict"].items()
                if "bridge_module." in k}
    return ckpt                                      # bare state dict


def load_reference_model(checkpoint: str | None, device: str | None,
                         reference_src: str):
    """Build the reference FullModel; load either checkpoint layout."""
    sys.path.insert(0, reference_src)
    import torch
    from vlm_bridge.model_architecture import FullModel

    model = FullModel(device=device) if device else FullModel()
    if checkpoint:
        sd = extract_bridge_state(
            torch.load(checkpoint, map_location=model.device))
        model.bridge_module.load_state_dict(sd, strict=True)
        print(f"loaded {len(sd)} bridge tensors from {checkpoint}")
    model.eval()
    return model


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="record a greedy-decode token transcript from the "
                    "REFERENCE model for vlm-parity check")
    ap.add_argument("images", nargs="+")
    ap.add_argument("--output", default="ref_transcript.jsonl")
    ap.add_argument("--checkpoint", default=None,
                    help=".pth in either reference layout (trainer or "
                         "save_model)")
    ap.add_argument("--max-length", type=int, default=50)
    ap.add_argument("--device", default=None)
    ap.add_argument("--reference-src", default="/root/reference/src",
                    help="path containing the vlm_bridge package")
    args = ap.parse_args(argv)

    model = load_reference_model(args.checkpoint, args.device,
                                 args.reference_src)
    record_transcripts(model, [Path(p) for p in args.images], args.output,
                       max_length=args.max_length)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
