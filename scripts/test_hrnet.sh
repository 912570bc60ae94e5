#!/usr/bin/env bash
# Port of `MinkowskiNet/scripts/test_hrnet.sh`.
set -eo pipefail
PARTNET_CATEGORY=$1
LOG_DIR=$2
DATAPATH=${DATAPATH:-"./data/partnet"}
python -m csn_tpu.tasks.main_seg \
  --is_train False \
  --resume "$LOG_DIR" \
  --partnet_path "$DATAPATH" \
  --partnet_category "$PARTNET_CATEGORY" \
  --save_pred_dir "${SAVE_PRED_DIR:-$LOG_DIR/results}" \
  "${@:3}"
