#!/usr/bin/env bash
# Round-5 TPU capture queue (round-4 verdict #1/#2): drain every remaining
# measurement. Ordered so the 9B diagnosis lands FIRST (it decides whether
# the int8 fused 9B retry is worth chip time), then the int4 story, then
# the r4 leftovers. Same resumability contract as tpu_capture_queue.sh:
# a step whose artifact exists and parses cleanly (no "error") is skipped.
#
#   bash scripts/tpu_capture_queue_r5.sh [perf_dir]
set -u
cd "$(dirname "$0")/.."
PERF="${1:-perf}"
mkdir -p "$PERF"
STAMP=$(date -u +%Y%m%dT%H%M%S)

have() {
    python3 - "$1" <<'PY'
import json, sys
try:
    text = open(sys.argv[1]).read()
    lines = [l for l in text.splitlines() if l.strip()]
    try:
        d = json.loads(lines[-1])
    except Exception:
        d = json.loads(text)
    sys.exit(0 if (isinstance(d, dict) and d and "error" not in d) else 1)
except Exception:
    sys.exit(1)
PY
}

step() {
    if have "$PERF/$1"; then
        echo "== SKIP $2 ($1 already captured) =="
        return 1
    fi
    echo "== $2 =="
    return 0
}

if step fused_9b_probe.json "1. 9B fused bisection probe (HBM vs Mosaic attribution)"; then
    timeout 7200 python scripts/fused_9b_probe.py \
        --output "$PERF/fused_9b_probe.json"
fi

if step int4_mlp_probe.json "2. int4 MLP probe (nibble-packed weights vs int8, decode shape)"; then
    timeout 1800 python scripts/int4_mlp_probe.py \
        --output "$PERF/int4_mlp_probe.json"
fi

if step int4_stack_ab.json "3. int4 whole-stack decode A/B (int8 vs int4 MLP, same process)"; then
    timeout 2400 python scripts/int4_stack_ab.py --batch 64 --len 50 \
        --output "$PERF/int4_stack_ab.json"
fi

if step decode_9b_batch32_int4.json "4. 9B int4 decode (MLP+head at 4 bits; largest byte win)"; then
    timeout 2400 python bench.py --preset gemma2_9b --decode-batch 32 \
        --mlp-int4 --quantize embedding4,mlp,attn,bridge \
        | tee "$PERF/decode_9b_batch32_int4.json"
fi

if step encoder_mm_full.json "5. full-encode A/B (blocks from the r4 micro best)"; then
    BLOCKS_M="${BLOCKS_M:-512}"
    BLOCKS_N="${BLOCKS_N:-256}"
    timeout 1200 python scripts/encoder_mm_ab.py --batch 64 \
        --block-m "$BLOCKS_M" --block-n "$BLOCKS_N" \
        --output "$PERF/encoder_mm_full.json"
fi

if step early_stop_ab.json "6. early-stop decode bound (while_loop overhead + short-scan)"; then
    timeout 1800 python scripts/early_stop_ab.py --batch 64 --len 50 \
        --short-len 25 --output "$PERF/early_stop_ab.json"
fi

if step batch_sweep.json "7. decode batch sweep (64 vs 96)"; then
    timeout 1800 python scripts/batch_sweep.py --batches 64,96 --len 50 \
        --output "$PERF/batch_sweep.json"
fi

if step eval_e2e.json "8. end-to-end vlm-eval (synthetic split, serving recipe)"; then
    EVAL_DATA="${EVAL_DATA:-/tmp/vlm-eval-synth}"
    if [ ! -f "$EVAL_DATA/test/captions.jsonl" ]; then
        timeout 900 vlm-data synth --output-dir "$EVAL_DATA" --num-samples 3000 \
            --platform cpu
    fi
    timeout 900 vlm-data precache --data-dir "$EVAL_DATA" --split test \
        --platform cpu
    timeout 2400 vlm-eval --data-dir "$EVAL_DATA" --split test --batch-size 64 \
        --max-length 50 --quantize embedding,mlp,attn,bridge --kv-int8 \
        --no-early-stop --output "$PERF/eval_e2e.json"
fi

echo "== r5 queue done ($STAMP) — commit the $PERF artifacts =="
