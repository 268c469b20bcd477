#!/bin/bash
# Resumable runner for the on-device decode-output A/B backlog
# (BENCHMARKS.md "On-device decode outputs"; the round-8 combined run
# blew the per-row timeout, so each (mode, seq) compiles in its own
# invocation). Appends to data/bench_runs_pending.jsonl; skips rows
# already recorded. One TPU job at a time.
set -u
cd "$(dirname "$0")/.."

OUT=data/bench_runs_pending.jsonl
mkdir -p data

record() {  # record <label> <cmd...>
    local label=$1; shift
    if grep -q "\"label\": \"$label\", \"line\"" "$OUT" 2>/dev/null; then
        echo ">>> $label: already recorded, skipping" >&2
        return 0
    fi
    echo ">>> $label: $*" >&2
    local line
    line=$("$@" 2>/dev/null | grep '^{' | tail -1)
    if [ -z "$line" ]; then
        echo "{\"label\": \"$label\", \"error\": \"no JSON output\"}" >> "$OUT"
        echo "    FAILED" >&2
        return 1
    fi
    printf '{"label": "%s", "line": %s}\n' "$label" "$line" >> "$OUT"
    echo "    $line" >&2
}

for mode in logits argmax topk beam; do
    for seq in 206 2048 6000; do
        record "decode_${mode}_${seq}_bf16" \
            timeout 580 python scripts/bench_decode_output.py \
            --iters 20 --seq "$seq" --dtype bfloat16 --modes "$mode"
    done
    record "decode_${mode}_206_fp32" \
        timeout 580 python scripts/bench_decode_output.py \
        --iters 20 --seq 206 --dtype float32 --modes "$mode"
done
echo "done -> $OUT" >&2
