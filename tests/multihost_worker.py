"""Worker process for the two-process jax.distributed test.

Launched by tests/test_multihost.py (not collected by pytest). Each process
contributes 2 virtual CPU devices; the pair forms a 4-device global mesh.
Runs the REAL path: init_multihost -> prepare_environment -> one training
epoch (2 steps) -> save_checkpoint, then prints a RESULT json line.
"""

import json
import sys


def main():
    rank = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    data_dir = sys.argv[4]
    out_dir = sys.argv[5]

    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon

    from vlm_bridge_tpu.parallel.distributed import (
        init_multihost, process_info)

    ok = init_multihost(f"127.0.0.1:{port}", nprocs, rank)
    assert ok, "init_multihost must run distributed init here"

    from vlm_bridge_tpu.configs import TrainingConfig
    from vlm_bridge_tpu.training import orchestrator

    tc = TrainingConfig(
        batch_size=4, num_epochs=1, data_dir=data_dir,
        checkpoint_dir=f"{out_dir}/rank{rank}/ckpt",
        log_dir=f"{out_dir}/rank{rank}/logs",
        model_preset="tiny_test", max_text_len=32, pad_to_buckets=(16, 32),
        num_workers=0, log_every_n_steps=1, max_steps_per_epoch=2,
        num_validation_samples=1, loss_chunk_size=16,
        mesh_shape=(4,),  # 4-way data parallel across BOTH processes
    )
    ctx = orchestrator.prepare_environment(tc)
    info = process_info()
    assert info["process_count"] == nprocs, info
    assert info["global_devices"] == 4 and info["local_devices"] == 2, info

    loss = orchestrator.run_training_epoch(ctx, 0)
    orchestrator.save_checkpoint(ctx, 0, val_loss=1.0, is_best=True)

    # writer gating: rank 0 gets the real event writer, others NullWriter
    writer_kind = type(ctx.writer).__name__
    print("RESULT " + json.dumps(
        {"rank": rank, "loss": float(loss), "writer": writer_kind, **info}),
        flush=True)


if __name__ == "__main__":
    main()
