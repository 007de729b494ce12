#!/usr/bin/env bash
# Hermetic end-to-end smoke: synth data -> train -> eval -> caption ->
# checkpoint conversion, all on the CPU backend with the tiny model.
# No network, no TPU, ~3 minutes. Exercises every CLI surface.
set -euo pipefail

WORK="${1:-$(mktemp -d /tmp/vlm-smoke.XXXX)}"
echo "== smoke workdir: $WORK =="

echo "== 1. synthetic dataset =="
vlm-data synth --output-dir "$WORK/data" --num-samples 100 --platform cpu

cat > "$WORK/config.yaml" <<EOF
model_preset: tiny_test
data_dir: $WORK/data
batch_size: 2
num_epochs: 1
max_steps_per_epoch: 4
gradient_accumulation_steps: 2
checkpoint_dir: $WORK/ckpt
log_dir: $WORK/logs
num_workers: 2
EOF

echo "== 2. training (1 epoch, grad accumulation, val + checkpoints) =="
vlm-training --config "$WORK/config.yaml" --platform cpu

test -d "$WORK/ckpt/latest" || { echo "missing latest checkpoint"; exit 1; }
ls "$WORK"/logs/events.out.tfevents.* >/dev/null

echo "== 3. batched eval (BLEU/CIDEr) from the trained checkpoint =="
vlm-eval --platform cpu --preset tiny --data-dir "$WORK/data" --split test \
    --batch-size 4 --max-length 8 --checkpoint "$WORK/ckpt/latest" \
    --output "$WORK/eval.json"
test -s "$WORK/eval.json"

echo "== 4. caption ad-hoc images (int8-quantized LM) =="
vlm-caption "$WORK/data/test/images" --platform cpu --preset tiny \
    --batch-size 4 --max-length 8 --quantize embedding,mlp,attn \
    --checkpoint "$WORK/ckpt/latest" --output "$WORK/captions.jsonl"
test -s "$WORK/captions.jsonl"

echo "== 5. checkpoint conversion round-trip (Orbax <-> reference .pth) =="
vlm-convert orbax-to-pth "$WORK/ckpt" "$WORK/bridge.pth" \
    --slot latest --preset tiny
vlm-convert show "$WORK/bridge.pth"
vlm-convert pth-to-orbax "$WORK/bridge.pth" "$WORK/ckpt2" --preset tiny

echo "== 6. generation debugger =="
vlm-debug --platform cpu --preset tiny --max-length 3 \
    --checkpoint "$WORK/ckpt/latest" --report "$WORK/debug.json"
test -s "$WORK/debug.json"

echo "SMOKE OK ($WORK)"
