#!/usr/bin/env bash
# Local controller for a remote TPU-VM training run.
#
# TPU-native counterpart of the reference's local vast.ai controller
# (reference: scripts/control_vastai_local.sh:129-213): SSH-tunnel TensorBoard
# with auto-reconnect, rsync checkpoints/logs back, tail training output.
#
# Usage:
#   TPU_NAME=my-tpu ZONE=us-central1-a ./scripts/control_tpu_local.sh <cmd>
# Commands:
#   setup      push scripts/setup_tpu_vm.sh to the VM and run it
#   monitor    tunnel localhost:6006 -> VM TensorBoard (auto-reconnect)
#   status     tail the remote training log
#   download   rsync checkpoints/ and logs/ to ./remote-artifacts/
#   stop       kill the remote training tmux session
set -euo pipefail

TPU_NAME="${TPU_NAME:?set TPU_NAME}"
ZONE="${ZONE:?set ZONE}"
PROJECT_FLAG=${PROJECT:+--project "$PROJECT"}
WORKDIR="${WORKDIR:-vlm-bridge-tpu}"
OUT="${OUT:-./remote-artifacts}"

tpu_ssh() {
  gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" $PROJECT_FLAG "$@"
}

case "${1:-}" in
  setup)
    # Push the LOCAL checkout (tracked files only) so the VM never needs a
    # clone URL, then run the bootstrap against it.
    tpu_ssh --command "mkdir -p $WORKDIR"
    git ls-files -z | tar --null -czf - -T - | \
      tpu_ssh --command "tar -xzf - -C $WORKDIR"
    tpu_ssh --command "WORKDIR=\$HOME/$WORKDIR bash $WORKDIR/scripts/setup_tpu_vm.sh"
    ;;
  monitor)
    echo "TensorBoard at http://localhost:6006 (ctrl-c to stop)"
    while true; do
      tpu_ssh -- -N -L 6006:localhost:6006 || true
      echo "tunnel dropped; reconnecting in 5s..."
      sleep 5
    done
    ;;
  status)
    tpu_ssh --command "tail -n 40 $WORKDIR/training.log"
    ;;
  download)
    mkdir -p "$OUT"
    for d in checkpoints logs; do
      gcloud compute tpus tpu-vm scp --recurse \
        "$TPU_NAME":"$WORKDIR/$d" "$OUT/" --zone "$ZONE" $PROJECT_FLAG || true
    done
    echo "artifacts in $OUT"
    ;;
  stop)
    tpu_ssh --command "tmux kill-session -t train" && echo "training stopped"
    ;;
  *)
    echo "usage: $0 {setup|monitor|status|download|stop}" >&2
    exit 1
    ;;
esac
