#!/usr/bin/env bash
# Bootstrap a Cloud TPU VM for bridge training and launch the full run.
#
# TPU-native counterpart of the reference's vast.ai bootstrap
# (reference: scripts/setup_vastai_remote.sh:23-85): installs deps, clones
# the repo, prepares the GroundCap dataset, starts TensorBoard on :6006 in
# the background, and runs vlm-training inside tmux so the session survives
# SSH drops.
#
# Run ON the TPU VM (after `gcloud compute tpus tpu-vm ssh $TPU_NAME`), or
# push it there with scripts/control_tpu_local.sh setup.
set -euo pipefail

REPO_URL="${REPO_URL:-}"
WORKDIR="${WORKDIR:-$HOME/vlm-bridge-tpu}"
DATA_DIR="${DATA_DIR:-$HOME/data/groundcap}"
CONFIG="${CONFIG:-config/training-default.yaml}"
HF_MODELS_DIR="${HF_MODELS_DIR:-$HOME/hf-models}"

echo "== system deps =="
sudo apt-get update -qq && sudo apt-get install -y -qq git tmux rsync >/dev/null

echo "== repo =="
# Preferred path: scripts/control_tpu_local.sh setup rsyncs the local
# checkout into $WORKDIR before running this script, so no clone is needed.
# REPO_URL is only required when bootstrapping a bare VM from a git remote.
if [ ! -f "$WORKDIR/pyproject.toml" ]; then
  if [ -z "$REPO_URL" ]; then
    echo "error: no checkout at $WORKDIR and REPO_URL is unset." >&2
    echo "Either push the tree with scripts/control_tpu_local.sh setup," >&2
    echo "or set REPO_URL=<git url of your fork> and re-run." >&2
    exit 1
  fi
  git clone "$REPO_URL" "$WORKDIR"
fi
cd "$WORKDIR"
if [ -d .git ]; then git pull --ff-only || true; fi

echo "== python deps (TPU jax) =="
pip install -q -U pip
pip install -q -U "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install -q -e ".[data,torch-compat]"

if [ -z "${HF_TOKEN:-}" ]; then
  read -rsp "HuggingFace token (for GroundCap + gated Gemma weights): " HF_TOKEN
  echo
fi
export HF_TOKEN

echo "== model snapshots =="
mkdir -p "$HF_MODELS_DIR"
python - <<PY
import os
from huggingface_hub import snapshot_download
root = os.path.expanduser("$HF_MODELS_DIR")
for repo in ("facebook/dinov2-large", "google/gemma-2-2b"):
    snapshot_download(repo, local_dir=os.path.join(root, repo.split("/")[-1]),
                      token=os.environ.get("HF_TOKEN"))
PY

echo "== dataset =="
if [ ! -f "$DATA_DIR/train/captions.jsonl" ]; then
  vlm-data transform --output-dir "$DATA_DIR"
fi

echo "== tensorboard (:6006, background) =="
tmux kill-session -t tb 2>/dev/null || true
tmux new-session -d -s tb "tensorboard --logdir logs --port 6006 --bind_all"

echo "== training (tmux session 'train') =="
tmux kill-session -t train 2>/dev/null || true
tmux new-session -d -s train \
  "vlm-training --config $CONFIG 2>&1 | tee -a training.log"

echo "done. attach with: tmux attach -t train"
