#!/usr/bin/env bash
# Port of `MinkowskiNet/scripts/test_csn.sh`: resolve the checkpoint dir and
# run evaluation with the test-split shape graph built against the train set.
set -eo pipefail

PARTNET_CATEGORY=$1
LOG_DIR=$2          # directory containing weights.msgpack + config.json
K_NEIGHBORS=${3:-1}
DATAPATH=${DATAPATH:-"./data/partnet"}
SAVE_PRED_DIR=${SAVE_PRED_DIR:-"$LOG_DIR/results"}

python -m csn_tpu.tasks.main_csn \
  --is_train False \
  --resume "$LOG_DIR" \
  --partnet_path "$DATAPATH" \
  --partnet_category "$PARTNET_CATEGORY" \
  --k_neighbors "$K_NEIGHBORS" \
  --save_pred_dir "$SAVE_PRED_DIR" \
  "${@:4}"
