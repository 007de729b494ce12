"""`vlm-parity`: one-command parity harness against the reference.

The BASELINE north star is token-for-token caption reproduction from
converted reference weights. This tool packages that check in three modes:

  self-check   No weights needed. Imports the reference's OWN
               bridge_module.py (pure torch, offline) and asserts forward
               parity + `.pth` strict-load round-trip at tiny or real dims
               (reference: src/vlm_bridge/model_architecture/
               bridge_module.py:240-471).

  check        Given real HF snapshots + a converted `.pth` + a recorded
               transcript (JSONL of {"image_path", "tokens" and/or
               "caption"}), run exact-mode greedy decode per image and
               assert token-for-token (or text) equality.

  record       Produce such a transcript from THIS framework's decode, so
               two builds (or a reference run instrumented to dump ids) can
               be diffed with `check`.

Transcript format: one JSON object per line;
  tokens  = full id sequence starting at BOS and ending at (and including)
            EOS, or running to max_length
  caption = decoded text (used when "tokens" is absent)
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
from pathlib import Path
from typing import List, Optional

DEFAULT_REFERENCE = "/root/reference/src/vlm_bridge/model_architecture/bridge_module.py"


def _load_reference_bridge(path: str | Path):
    spec = importlib.util.spec_from_file_location("ref_bridge_module", str(path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_bridge_module"] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# self-check: reference module as oracle, no weights required
# ---------------------------------------------------------------------------


def self_check(reference: str, dims: str) -> int:
    import numpy as np
    import torch

    import jax

    # a numerics oracle needs true f32: the TPU backend computes f32 matmuls
    # in bf16 MXU passes by default (observed max|diff| ~2e-2), so pin the
    # tiny oracle compute to CPU
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vlm_bridge_tpu.configs import BridgeConfig
    from vlm_bridge_tpu.models import bridge as bridge_mod
    from vlm_bridge_tpu.params.torch_bridge import (
        bridge_from_state_dict, bridge_to_state_dict)

    ref_path = Path(reference)
    if not ref_path.exists():
        print(f"FAIL: reference module not found at {ref_path}")
        return 2
    ref = _load_reference_bridge(ref_path)

    if dims == "real":
        cfg = BridgeConfig(dropout=0.0)          # 1024/2304/8/18, FFN x4
        B, T, S = 1, 5, 257
        atol = 5e-4
    else:
        cfg = BridgeConfig(vision_dim=32, language_dim=64, num_blocks=2,
                           num_heads_cross=2, num_heads_self=4, ffn_mult=4,
                           dropout=0.0)
        B, T, S = 2, 6, 9
        atol = 2e-5

    torch.manual_seed(0)
    ref_bridge = ref.BridgeLite(
        vision_dim=cfg.vision_dim, language_dim=cfg.language_dim,
        num_blocks=cfg.num_blocks, num_heads_cross=cfg.num_heads_cross,
        num_heads_self=cfg.num_heads_self, dropout=0.0)
    ref_bridge.eval()

    rng = np.random.default_rng(1)
    text = rng.normal(0, 1, (B, T, cfg.language_dim)).astype(np.float32)
    vision = rng.normal(0, 1, (B, S, cfg.vision_dim)).astype(np.float32)

    with torch.no_grad():
        want = ref_bridge(torch.from_numpy(vision),
                          torch.from_numpy(text)).numpy()
    params = bridge_from_state_dict(ref_bridge.state_dict(), cfg)
    got = np.asarray(bridge_mod.forward(
        params, cfg, jnp.asarray(text), jnp.asarray(vision)))
    diff = float(np.abs(got - want).max())
    fwd_ok = diff <= atol + atol * float(np.abs(want).max())

    # .pth layout: our export must strict-load into the reference module
    sd = bridge_to_state_dict(
        bridge_mod.init(jax.random.key(0), cfg), cfg)
    try:
        ref_bridge.load_state_dict(
            {k: torch.from_numpy(np.array(v))  # copy: jnp buffers are read-only
             for k, v in sd.items()}, strict=True)
        sd_ok = True
    except Exception as e:  # pragma: no cover - failure reporting
        print(f"state_dict strict load failed: {e}")
        sd_ok = False

    print(f"forward parity ({dims} dims): max|diff|={diff:.2e} "
          f"-> {'OK' if fwd_ok else 'FAIL'}")
    print(f"state_dict layout: {'OK' if sd_ok else 'FAIL'}")
    print("PARITY SELF-CHECK " + ("PASSED" if fwd_ok and sd_ok else "FAILED"))
    return 0 if fwd_ok and sd_ok else 1


# ---------------------------------------------------------------------------
# transcript check / record
# ---------------------------------------------------------------------------


def _decode_images(args, image_paths: List[Path]):
    """exact-mode greedy tokens for each image, one at a time (batch-1 keeps
    numerics independent of batch composition)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    # token-for-token checks must not depend on the backend's reduced-
    # precision f32 matmul mode (bf16 MXU passes can flip near-tie argmaxes)
    jax.config.update("jax_default_matmul_precision", "highest")

    from vlm_bridge_tpu.data.preprocess import host_resize_crop, normalize_on_device
    from vlm_bridge_tpu.inference.generate import (
        GenerationConfig, generate_tokens)
    from vlm_bridge_tpu.tools.loading import load_from_args

    cfg, params, tokenizer = load_from_args(args)
    if args.pth:
        from vlm_bridge_tpu.params.torch_bridge import load_pth

        params["bridge"] = load_pth(args.pth, cfg.bridge)

    gen = GenerationConfig(max_length=args.max_length, greedy=True, exact=True)
    from PIL import Image

    for p in image_paths:
        with Image.open(p) as img:
            pixels = host_resize_crop(img)[None]
        pixels = normalize_on_device(jnp.asarray(pixels), dtype=jnp.float32)
        toks, lengths = generate_tokens(
            params, cfg, pixel_values=pixels, gen=gen,
            activation_dtype=jnp.float32)
        toks, n = np.asarray(toks)[0], int(np.asarray(lengths)[0])
        ids = toks[: min(n + 1, toks.shape[0])].tolist()  # incl. EOS if hit
        yield p, ids, tokenizer.decode(ids)


def run_check(args) -> int:
    rows = [json.loads(l) for l in Path(args.transcript).read_text().splitlines()
            if l.strip()]
    root = Path(args.data_dir or Path(args.transcript).parent)
    paths = [root / r["image_path"] for r in rows]
    failures = 0
    for (p, ids, text), row in zip(_decode_images(args, paths), rows):
        ok = True
        if "tokens" in row:
            ok = list(map(int, row["tokens"])) == ids
        elif "caption" in row:
            ok = row["caption"].strip() == text.strip()
        status = "OK  " if ok else "FAIL"
        print(f"{status} {row['image_path']}: {text[:60]!r}")
        if not ok:
            failures += 1
            if "tokens" in row:
                print(f"     want tokens: {row['tokens']}")
                print(f"     got  tokens: {ids}")
            else:
                print(f"     want: {row.get('caption', '')!r}")
    print(f"token-for-token parity: {len(rows) - failures}/{len(rows)} matched")
    return 1 if failures else 0


def run_record(args) -> int:
    paths = [Path(p) for p in args.images]
    out = Path(args.output)
    with out.open("w") as f:
        for p, ids, text in _decode_images(args, paths):
            f.write(json.dumps({"image_path": str(p), "tokens": ids,
                                "caption": text}) + "\n")
            print(f"recorded {p}: {len(ids)} tokens")
    print(f"wrote {out}")
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        prog="vlm-parity",
        description="token-for-token parity harness vs the reference")
    sub = ap.add_subparsers(dest="mode", required=True)

    sc = sub.add_parser("self-check", help="reference bridge_module.py as "
                        "oracle (no weights needed)")
    sc.add_argument("--reference", default=DEFAULT_REFERENCE,
                    help="path to the reference bridge_module.py")
    sc.add_argument("--dims", default="real", choices=["real", "tiny"])

    from vlm_bridge_tpu.tools.loading import add_model_args, apply_platform

    ck = sub.add_parser("check", help="decode images, compare to a recorded "
                        "transcript token-for-token")
    ck.add_argument("--transcript", required=True)
    ck.add_argument("--data-dir", default=None,
                    help="image paths resolve against this (default: the "
                         "transcript's directory)")
    ck.add_argument("--pth", default=None,
                    help="reference .pth bridge checkpoint to convert+load")
    ck.add_argument("--max-length", type=int, default=50)
    add_model_args(ck)

    rec = sub.add_parser("record", help="write a transcript from this build")
    rec.add_argument("images", nargs="+")
    rec.add_argument("--output", default="transcript.jsonl")
    rec.add_argument("--pth", default=None)
    rec.add_argument("--max-length", type=int, default=50)
    add_model_args(rec)

    args = ap.parse_args(argv)
    if args.mode == "self-check":
        return self_check(args.reference, args.dims)
    apply_platform(args)
    if args.mode == "check":
        return run_check(args)
    return run_record(args)


if __name__ == "__main__":
    raise SystemExit(main())
