#!/bin/bash
# Serial TPU measurement battery. The tunnel is flaky — when it comes
# back, run this once; every step logs to $OUT and survives individual
# failures, so one good window captures everything.
#
#   bash tools/tpu_battery.sh [/tmp/tpu_battery]
set -u
OUT=${1:-/tmp/tpu_battery}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {
    name=$1; shift
    echo "=== $name: $* ==="
    ( timeout 900 "$@" ) >"$OUT/$name.log" 2>&1
    echo "--- rc=$? (tail) ---"
    tail -3 "$OUT/$name.log"
}

step 00_devices python -u -c "import jax; print(jax.devices())"

# headline bench (committed defaults: cf auto + dynamic-row kernel)
step 10_bench python bench.py --latency
# A/B: layout off (isolates the CF win)
step 11_bench_cf_off python bench.py --cf off
# A/B: bigger batch frontier
step 12_bench_b16 python bench.py --batch 16

# full-model trace at batch 8 for the op breakdown
step 20_trace python tools/profile.py \
    cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion \
    --mode infer --batch 8 --bf16 --trace-dir "$OUT/trace_infer"
step 21_trace_ops python tools/trace_ops.py "$OUT/trace_infer" --top 25

# standalone RoIAlign kernel (compare: 11.60 ms/stage dense-row CHUNK=4)
step 30_roi_kernel python tools/trace_roi_kernel.py "$OUT/trace_roi"
step 31_roi_ops python tools/trace_ops.py "$OUT/trace_roi" --top 4

# NHWC vs channels-first block-chain probe
step 40_layout python tools/probe_layout.py --trace-dir "$OUT/probe_layout"

# train: convergence smoke + honest throughput
step 50_overfit python tools/train.py tiny_fusion_test --synthetic \
    --overfit-check --max-iters 200 --log-interval 20 --img-hw 64 96
step 51_train_tput python tools/profile.py \
    cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion \
    --mode train --batch 8 --bf16 --remat

echo "=== battery done; logs in $OUT ==="
