#!/usr/bin/env bash
# Round-5 final captures, ordered by value. Serializes all chip work
# (one real TPU). Resumable: each step is skipped once its artifact
# parses clean (same `have` contract as the earlier queues).
#
# 1. 9B decode with the recipe the int4 attribution probe validated
#    (int8 embedding + int4 MLP: the 42-layer int8 stack was 8.3 GB and
#    OOM'd; int4 MLP cuts it to ~5.1 GB, under the measured 26-layer
#    int8 line of 5.16 GB that ran).
# 2. End-to-end vlm-eval rate (host pipeline + device decode).
# 3. Cold-vs-cold scan-layers train compile A/B at a novel batch size.
# 4. Full-encode Pallas-vs-XLA A/B (tunnel retry).
set -u
cd "$(dirname "$0")/.."
PERF="${1:-perf}"
mkdir -p "$PERF"

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
    bad = ("error" in d) or ("errors" in d)
    sys.exit(0 if (isinstance(d, dict) and d and not bad) else 1)
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

if step decode_9b_batch32_int4mlp.json "1. 9B fused decode, int8-embedding + int4-MLP recipe"; then
    timeout 3600 python bench.py --preset gemma2_9b --decode-batch 32 \
        --mlp-int4 --quantize embedding,mlp,attn,bridge \
        | tee "$PERF/decode_9b_batch32_int4mlp.json"
fi

if step eval_e2e.json "2. end-to-end vlm-eval (pre-stacked serving recipe)"; then
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

if step train_scan_ab_cold.json "3. cold-vs-cold scan A/B (novel batch => both compiles miss the axon server cache)"; then
    timeout 2400 python bench.py --skip-decode --scan-layers --batch 12 \
        | tee "$PERF/train_scan_layers_cold.json"
    timeout 2400 python bench.py --skip-decode --batch 12 \
        | tee "$PERF/train_unrolled_cold.json"
    python3 - "$PERF" <<'PY'
import json, sys, os
perf = sys.argv[1]
def last(fn):
    with open(os.path.join(perf, fn)) as f:
        lines = f.read().splitlines()
    return json.loads([l for l in lines if l.strip()][-1])
a = last("train_scan_layers_cold.json"); b = last("train_unrolled_cold.json")
out = {
  "metric": "train_scan_ab_cold",
  "train_batch": 12,
  "scan_compile_s": a.get("train_compile_s"),
  "unrolled_compile_s": b.get("train_compile_s"),
  "scan_step_ms": a.get("train_step_ms"),
  "unrolled_step_ms": b.get("train_step_ms"),
  "scan_samples_per_sec": a.get("train_samples_per_sec"),
  "unrolled_samples_per_sec": b.get("train_samples_per_sec"),
  "note": "batch 12 is novel to the axon terminal's server-side compile "
          "cache, so BOTH programs compile cold (the r5b A/B compared a "
          "cold scan against an r4-warm unrolled program)",
}
if out["scan_compile_s"] and out["unrolled_compile_s"]:
    out["compile_speedup"] = round(out["unrolled_compile_s"] / out["scan_compile_s"], 2)
if out["scan_step_ms"] and out["unrolled_step_ms"]:
    out["step_ratio_scan_vs_unrolled"] = round(out["scan_step_ms"] / out["unrolled_step_ms"], 4)
with open(os.path.join(perf, "train_scan_ab_cold.json"), "w") as f:
    f.write(json.dumps(out) + "\n")
print(json.dumps(out))
PY
fi

if step encoder_mm_full.json "4. full-encode A/B (tunnel retry)"; then
    BLOCKS_M="${BLOCKS_M:-512}"
    BLOCKS_N="${BLOCKS_N:-256}"
    timeout 2400 python scripts/encoder_mm_ab.py --batch 64 \
        --block-m "$BLOCKS_M" --block-n "$BLOCKS_N" \
        --output "$PERF/encoder_mm_full.json"
fi

echo "== r5d queue done =="
