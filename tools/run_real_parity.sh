#!/usr/bin/env bash
# One-command real-data accuracy parity: .pth checkpoint -> convert ->
# eval -> mAP report, ready for the day released weights + a real
# dataset reach this environment (BASELINE.md: "mAP within 0.1").
#
# Usage:
#   tools/run_real_parity.sh <ckpt.pth> <data_root> [config] [out_dir]
#   tools/run_real_parity.sh --dry-run             # synthetic CI check
#
# <data_root> is the reference-layout dataset root, i.e. what the
# reference's tools/create_data.py + export_2d_annotation produced
# (nuscenes: ann json + samples/; stf: SeeingThroughFog layout). The
# reference protocol baseline for the default config is
# `configs/hrfuser/cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion.py`
# (reference README model-zoo row: HRFuser-T nuScenes mAP).
set -euo pipefail
cd "$(dirname "$0")/.."

CONFIG_DEFAULT=cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion

if [[ "${1:-}" == "--dry-run" ]]; then
    # Synthetic end-to-end rehearsal of the exact command chain (no
    # weights/data needed): fake a .pth from the torch oracle's layout,
    # convert it, run the evaluator on synthetic batches.
    echo "[parity --dry-run] synthetic convert->eval rehearsal"
    TMP=$(mktemp -d)
    trap 'rm -rf "$TMP"' EXIT
    python - "$TMP" <<'EOF'
import sys, torch
sys.path.insert(0, '.')
from tests.oracles.torch_hrfuser import TorchHRFuserDetector
from hrfuser_tpu.configs import get_config
torch.manual_seed(0)
tm = TorchHRFuserDetector(get_config('tiny_fusion_test').model).eval()
torch.save({'state_dict': tm.state_dict()}, sys.argv[1] + '/fake.pth')
print('wrote', sys.argv[1] + '/fake.pth', len(tm.state_dict()), 'tensors')
EOF
    python tools/convert_pth.py "$TMP/fake.pth" tiny_fusion_test \
        "$TMP/conv" --input-hw 64 96
    python tools/test.py tiny_fusion_test --synthetic \
        --checkpoint "$TMP/conv/converted" --out "$TMP/metrics.json"
    cat "$TMP/metrics.json"
    echo "[parity --dry-run] OK"
    exit 0
fi

CKPT=${1:?usage: run_real_parity.sh <ckpt.pth> <data_root> [config] [out]}
DATA=${2:?need data_root}
CONFIG=${3:-$CONFIG_DEFAULT}
OUT=${4:-work_dirs/parity_$CONFIG}
mkdir -p "$OUT"

echo "[parity 1/3] converting $CKPT -> $OUT/converted"
python tools/convert_pth.py "$CKPT" "$CONFIG" "$OUT"

echo "[parity 2/3] evaluating on $DATA"
python tools/test.py "$CONFIG" --checkpoint "$OUT/converted" \
    --data-root "$DATA" --eval bbox,proposal_fast \
    --out "$OUT/metrics.json"

echo "[parity 3/3] results ($OUT/metrics.json):"
cat "$OUT/metrics.json"
echo
echo "Compare bbox_mAP against the reference model-zoo row for $CONFIG"
echo "(reference README; BASELINE.md gate: |delta mAP| <= 0.1)."
