#!/usr/bin/env bash
# Round-5 follow-up captures, run after tpu_capture_queue_r5.sh:
#  - the int4 reruns now that ops/quant.unpack_int4 compiles on chip
#    (v5e Mosaic legalizes neither cmpi nor shifts on vector i8; the i32
#    widening fix landed mid-queue, so the first-pass int4 artifacts
#    recorded the refusal, not the kernel)
#  - the full-encode A/B with a budget that survives its ~8 min of
#    compiles (first pass timed out at 1200 s producing nothing)
#  - the scan-layers train A/B (compile time vs step time, verdict #4)
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

if step int4_mlp_probe.json "1. int4 MLP probe (fixed unpack)"; then
    timeout 1800 python scripts/int4_mlp_probe.py \
        --output "$PERF/int4_mlp_probe.json"
fi

if step int4_stack_ab.json "2. int4 whole-stack decode A/B (fixed unpack)"; then
    timeout 3000 python scripts/int4_stack_ab.py --batch 64 --len 50 \
        --output "$PERF/int4_stack_ab.json"
fi

if step decode_9b_batch32_int4.json "3. 9B int4 decode (fixed unpack)"; then
    timeout 2400 python bench.py --preset gemma2_9b --decode-batch 32 \
        --mlp-int4 --quantize embedding4,mlp,attn,bridge \
        | tee "$PERF/decode_9b_batch32_int4.json"
fi

if step decode_2b_batch64_int4.json "3b. 2B int4 decode (bench-form artifact of the int4 recipe)"; then
    timeout 2400 python bench.py --skip-train --mlp-int4 \
        --quantize embedding4,mlp,attn,bridge \
        | tee "$PERF/decode_2b_batch64_int4.json"
fi

if step encoder_mm_full.json "4. full-encode A/B (longer budget)"; then
    BLOCKS_M="${BLOCKS_M:-512}"
    BLOCKS_N="${BLOCKS_N:-256}"
    timeout 2400 python scripts/encoder_mm_ab.py --batch 64 \
        --block-m "$BLOCKS_M" --block-n "$BLOCKS_N" \
        --output "$PERF/encoder_mm_full.json"
fi

if step train_scan_ab.json "5. scan-layers train A/B (compile + step time)"; then
    # two bench runs, same flags except the layer layout; the scan run
    # carries the verdict-#4 claim so it goes first while the chip is warm
    timeout 2400 python bench.py --skip-decode --scan-layers \
        | tee "$PERF/train_scan_layers.json"
    timeout 2400 python bench.py --skip-decode \
        | tee "$PERF/train_unrolled.json"
    python3 - "$PERF" <<'PY'
import json, sys, os
perf = sys.argv[1]
def last(fn):
    with open(os.path.join(perf, fn)) as f:
        lines = f.read().splitlines()
    return json.loads([l for l in lines if l.strip()][-1])
a = last("train_scan_layers.json"); b = last("train_unrolled.json")
out = {
  "metric": "train_scan_ab",
  "scan_compile_s": a.get("train_compile_s"),
  "unrolled_compile_s": b.get("train_compile_s"),
  "scan_step_ms": a.get("train_step_ms"),
  "unrolled_step_ms": b.get("train_step_ms"),
  "scan_samples_per_sec": a.get("train_samples_per_sec"),
  "unrolled_samples_per_sec": b.get("train_samples_per_sec"),
}
if out["scan_compile_s"] and out["unrolled_compile_s"]:
    out["compile_speedup"] = round(out["unrolled_compile_s"] / out["scan_compile_s"], 2)
if out["scan_step_ms"] and out["unrolled_step_ms"]:
    out["step_ratio_scan_vs_unrolled"] = round(out["scan_step_ms"] / out["unrolled_step_ms"], 4)
with open(os.path.join(perf, "train_scan_ab.json"), "w") as f:
    f.write(json.dumps(out) + "\n")
print(json.dumps(out))
PY
fi

echo "== r5b queue done =="
