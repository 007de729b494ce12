"""`vlm-training` CLI (reference: training_strategy/cli.py:11-57).

  vlm-training --config config/training-default.yaml [--resume latest]

On first run with a missing config file, defaults are materialized to the
given path (reference cli.py:46-50).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="vlm-training",
        description="Bridge-only training of the captioning stack (TPU-native)")
    parser.add_argument("--config", default="config/training-default.yaml")
    parser.add_argument(
        "--resume", nargs="?", const="latest", default=None,
        help="resume from a checkpoint slot (default: latest)")
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force a JAX backend (needed for CPU smoke runs in environments "
             "that pin an accelerator platform at interpreter startup)")
    args = parser.parse_args(argv)

    if args.platform:
        import os

        if args.platform == "cpu":
            os.environ.setdefault("VLM_BRIDGE_DISABLE_PALLAS", "1")
        import jax

        jax.config.update("jax_platforms", args.platform)

    # multi-host/slice bootstrap (no-op on a single host)
    from vlm_bridge_tpu.parallel.distributed import init_multihost, process_info

    if init_multihost():
        print(f"distributed init: {process_info()}")

    from vlm_bridge_tpu.configs import TrainingConfig
    from vlm_bridge_tpu.training.orchestrator import execute_full_training

    cfg_path = Path(args.config)
    tc = TrainingConfig.from_yaml(cfg_path)
    if not cfg_path.exists():
        tc.to_yaml(cfg_path)
        print(f"wrote default config to {cfg_path}")
    if args.resume:
        tc.resume_from_checkpoint = args.resume

    result = execute_full_training(tc)
    print(f"training complete: best val loss {result['best_val_loss']:.4f} "
          f"over {result['epochs_run']} epochs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
