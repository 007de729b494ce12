#!/usr/bin/env bash
# Round-4 TPU capture queue (round-3 verdict #1/#2/#4/#5): every pending
# number gets a committed perf/*.json artifact. Run when the axon tunnel is
# up (bench.py's availability gate makes each step outage-tolerant anyway).
#
#   bash scripts/tpu_capture_queue.sh [perf_dir]
#
# Steps (each individually timed out; failures don't stop the rest):
#   1. default bench: train bs=8 + 2B batch-64 fused-stack decode
#   2. 9B fused-stack decode (batch 32, layer-streamed int8 init)
#   3. encoder projection micro A/B (XLA vs Pallas tiled matmul)
#   4. full-encode A/B at the best blocks from (3) — edit BLOCKS below
#   5. end-to-end vlm-eval on a synthetic test split, serving recipe
#   6. early-stop decode bound (while_loop overhead + short-scan projection)
#   7. int4 nibble-packed MLP vs int8 same-trace A/B at the decode shape
#   8. int4 whole-stack decode A/B (generate end-to-end, same process)
#   9. 9B int4 decode (nibble-packed MLP + head on the streamed build)
set -u
cd "$(dirname "$0")/.."
PERF="${1:-perf}"
mkdir -p "$PERF"
STAMP=$(date -u +%Y%m%dT%H%M%S)

echo "== 1. default bench (train + 2B fused decode) =="
timeout 2400 python bench.py | tee "$PERF/bench_r4_default.json"
# decode-only view of the same recipe for the named artifact the verdict asks for
timeout 1800 python bench.py --skip-train | tee "$PERF/decode_2b_batch64_fused.json"

echo "== 2. 9B fused-stack decode =="
timeout 2400 python bench.py --preset gemma2_9b --decode-batch 32 \
    | tee "$PERF/decode_9b_batch32_fused.json"

echo "== 3. encoder projection micro A/B =="
timeout 1800 python scripts/encoder_mm_ab.py --micro --batch 64 \
    --output "$PERF/encoder_mm_micro.json"

echo "== 4. full-encode A/B (set blocks from step 3's best) =="
BLOCKS_M="${BLOCKS_M:-512}"
BLOCKS_N="${BLOCKS_N:-256}"
timeout 1200 python scripts/encoder_mm_ab.py --batch 64 \
    --block-m "$BLOCKS_M" --block-n "$BLOCKS_N" \
    --output "$PERF/encoder_mm_full.json"

echo "== 5. end-to-end vlm-eval (synthetic split, serving recipe) =="
EVAL_DATA="${EVAL_DATA:-/tmp/vlm-eval-synth}"
if [ ! -f "$EVAL_DATA/test/captions.jsonl" ]; then
    timeout 900 vlm-data synth --output-dir "$EVAL_DATA" --num-samples 3000 \
        --platform cpu
fi
# pixel cache: without it the 1-core host JPEG path (~90 images/s) is the
# eval bottleneck, below the ~165 captions/s the decode kernels sustain
timeout 900 vlm-data precache --data-dir "$EVAL_DATA" --split test \
    --platform cpu
timeout 2400 vlm-eval --data-dir "$EVAL_DATA" --split test --batch-size 64 \
    --max-length 50 --quantize embedding,mlp,attn,bridge --kv-int8 \
    --no-early-stop --output "$PERF/eval_e2e.json"

echo "== 6. early-stop decode bound (while_loop overhead + short-scan) =="
timeout 1800 python scripts/early_stop_ab.py --batch 64 --len 50 \
    --short-len 25 --output "$PERF/early_stop_ab.json"

echo "== 7. int4 MLP probe (nibble-packed weights vs int8, decode shape) =="
timeout 1800 python scripts/int4_mlp_probe.py \
    --output "$PERF/int4_mlp_probe.json"

echo "== 8. int4 whole-stack decode A/B (int8 vs int4 MLP, same process) =="
timeout 2400 python scripts/int4_stack_ab.py --batch 64 --len 50 \
    --output "$PERF/int4_stack_ab.json"

echo "== 9. 9B int4 decode (MLP+head at 4 bits; largest byte win) =="
timeout 2400 python bench.py --preset gemma2_9b --decode-batch 32 \
    --mlp-int4 --quantize embedding4,mlp,attn,bridge \
    | tee "$PERF/decode_9b_batch32_int4.json"

echo "== queue done ($STAMP) — commit the $PERF artifacts =="
