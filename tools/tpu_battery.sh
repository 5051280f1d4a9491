#!/bin/bash
# Serial TPU measurement battery. The tunnel is flaky — when it comes
# back, run this once; every step logs to $OUT and survives individual
# failures LOUDLY: each step's rc lands in summary.json and the final
# line flags any non-zero step (VERDICT r2 #9 — an empty log must not
# read as success).
#
#   bash tools/tpu_battery.sh [/tmp/tpu_battery]
set -u
OUT=${1:-/tmp/tpu_battery}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

SUMMARY="$OUT/summary.json"
echo '{' > "$SUMMARY"
FIRST=1
FAILED=()

step() {
    name=$1; shift
    echo "=== $name: $* ==="
    local t0=$SECONDS
    ( timeout 1500 "$@" ) >"$OUT/$name.log" 2>&1
    local rc=$?
    local dt=$((SECONDS - t0))
    if [ $rc -ne 0 ]; then
        echo "!!! $name FAILED rc=$rc after ${dt}s (tail below)"
        FAILED+=("$name")
    else
        echo "--- $name ok rc=0 ${dt}s (tail) ---"
    fi
    tail -3 "$OUT/$name.log"
    [ $FIRST -eq 0 ] && echo ',' >> "$SUMMARY"
    FIRST=0
    printf '  "%s": {"rc": %d, "seconds": %d}' "$name" "$rc" "$dt" \
        >> "$SUMMARY"
}

step 00_devices python -u -c "import jax; print(jax.devices())"

# headline bench (committed defaults: cf auto + v7 kernel, honest inputs)
step 10_bench python bench.py --latency
# A/B: layout off (isolates the CF win)
step 11_bench_cf_off python bench.py --cf off
# A/B: bigger batch frontier
step 12_bench_b16 python bench.py --batch 16

# full-model trace at batch 8 for the op breakdown (+ grouped)
# --iters 2: jax.profiler traces beyond ~2-5 steps hang the tunnel
# (r4 lesson, see .claude/skills/verify/SKILL.md)
step 20_trace python tools/profile.py \
    cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion \
    --mode infer --batch 8 --bf16 --iters 2 --trace-dir "$OUT/trace_infer"
step 21_trace_ops python tools/trace_ops.py "$OUT/trace_infer" --top 25
step 22_trace_groups python tools/trace_groups.py "$OUT/trace_infer"

# roofline numerator: FLOPs + cost-analysis bytes
step 25_flops python tools/get_flops.py \
    cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion --batch 8 --bf16

# standalone RoIAlign kernel A/B on a realistic RoI distribution
step 30_roi_lab python tools/roi_kernel_lab.py --variants v4 v7 --check

# train: convergence smoke + honest throughput
step 50_overfit python tools/train.py tiny_fusion_test --synthetic \
    --overfit-check --max-iters 200 --log-interval 20 --img-hw 64 96
step 51_train_tput python tools/profile.py \
    cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion \
    --mode train --batch 8 --bf16 --iters 2 --trace-dir "$OUT/trace_train"

echo '' >> "$SUMMARY"
echo '}' >> "$SUMMARY"
echo "=== battery done; logs in $OUT; summary: ==="
cat "$SUMMARY"
if [ ${#FAILED[@]} -gt 0 ]; then
    echo "!!! FAILED steps: ${FAILED[*]}"
    exit 1
fi
