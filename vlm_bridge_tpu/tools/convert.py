"""`vlm-convert` CLI: bridge checkpoint interop (Orbax <-> reference .pth).

The BASELINE north star requires token-for-token caption reproduction from
converted reference weights, which needs lossless two-way conversion:

  pth -> orbax   import a reference checkpoint (either of the reference's two
                 on-disk layouts, or a bare state dict) into a weights-only
                 Orbax slot this framework can train/serve from
  orbax -> pth   export any Orbax slot back to the reference's documented
                 weights-only format (FullModel.save_model layout,
                 reference: full_model.py:442-461)

Reference formats handled by params/torch_bridge.py (SURVEY.md §2 note 1).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="vlm-convert", description="bridge checkpoint conversion")
    # Conversion is host-side weights IO — it never benefits from an
    # accelerator, and initializing a remote TPU backend can stall the CLI
    # behind an unrelated tunnel outage, so the default is cpu.
    ap.add_argument("--platform", default="cpu",
                    help="JAX backend for tree ops (default cpu)")
    sub = ap.add_subparsers(dest="command", required=True)

    p_i = sub.add_parser("pth-to-orbax", help="reference .pth -> Orbax slot")
    p_i.add_argument("pth", help="input .pth checkpoint")
    p_i.add_argument("out_dir", help="checkpoint store directory")
    p_i.add_argument("--slot", default="imported")
    p_i.add_argument("--preset", default="default",
                     choices=["default", "tiny", "tiny_ref", "gemma2_9b"])

    p_e = sub.add_parser("orbax-to-pth", help="Orbax slot -> reference .pth")
    p_e.add_argument("store_dir", help="checkpoint store directory")
    p_e.add_argument("out_pth", help="output .pth path")
    p_e.add_argument("--slot", default="best_weights_only")
    p_e.add_argument("--preset", default="default",
                     choices=["default", "tiny", "tiny_ref", "gemma2_9b"])

    p_s = sub.add_parser("show", help="print a .pth checkpoint's layout")
    p_s.add_argument("pth")

    args = ap.parse_args(argv)

    from vlm_bridge_tpu.tools.loading import apply_platform

    apply_platform(args)

    from vlm_bridge_tpu.configs import VLMConfig

    def bridge_cfg(preset):
        presets = {"default": VLMConfig.default, "tiny": VLMConfig.tiny_test,
                   "tiny_ref": VLMConfig.tiny_ref,
                   "gemma2_9b": VLMConfig.gemma2_9b}
        return presets[preset]().bridge

    if args.command == "pth-to-orbax":
        from vlm_bridge_tpu.params.torch_bridge import load_pth
        from vlm_bridge_tpu.runtime.checkpoint import CheckpointStore

        cfg = bridge_cfg(args.preset)
        params = load_pth(args.pth, cfg)
        store = CheckpointStore(args.out_dir)
        store.save(args.slot, bridge_params=params,
                   meta={"source": str(Path(args.pth).resolve())})
        n = sum(x.size for x in _leaves(params))
        print(f"imported {n:,} params -> {args.out_dir}/{args.slot}")

    elif args.command == "orbax-to-pth":
        import jax

        from vlm_bridge_tpu.models import bridge as bridge_mod
        from vlm_bridge_tpu.runtime.checkpoint import CheckpointStore

        cfg = bridge_cfg(args.preset)
        template = bridge_mod.init(jax.random.key(0), cfg)
        store = CheckpointStore(args.store_dir)
        store.export_pth(args.slot, cfg, args.out_pth,
                         template={"bridge_params": template})
        print(f"exported {args.store_dir}/{args.slot} -> {args.out_pth}")

    elif args.command == "show":
        import torch

        ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
        if "bridge_module_state_dict" in ckpt:
            layout, sd = "FullModel.save_model", ckpt["bridge_module_state_dict"]
        elif "model_state_dict" in ckpt:
            layout, sd = "trainer checkpoint", ckpt["model_state_dict"]
        else:
            layout, sd = "bare state dict", ckpt
        bridge_keys = [k for k in sd if "bridge_blocks" in k]
        n = sum(v.numel() for k, v in sd.items() if "bridge_blocks" in k)
        print(f"layout: {layout}; {len(bridge_keys)} bridge tensors, "
              f"{n:,} params")
        for k in sorted(bridge_keys)[:8]:
            print(f"  {k}: {tuple(sd[k].shape)}")
        if len(bridge_keys) > 8:
            print(f"  ... {len(bridge_keys) - 8} more")
        if sd is not ckpt:  # wrapper layouts: list non-weight sidecar keys
            extra = sorted(set(ckpt) - {"bridge_module_state_dict",
                                        "model_state_dict"})
            if extra:
                print(f"sidecar keys: {extra}")

    return 0


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)


if __name__ == "__main__":
    raise SystemExit(main())
