#!/usr/bin/env bash
# Port of `MinkowskiNet/scripts/training_csn.sh`: loop the 17 PartNet
# categories, derive per-category STAT_FREQ from the training-set size, and
# launch scripts/train_csn.sh for each.
set -eo pipefail

K_NEIGHBORS=${1:-1}

source "$(dirname "$0")/partnet_categories.sh"
BATCH_SIZE=${BATCH_SIZE:-8}

for i in "${!CATEGORIES[@]}"; do
  CAT=${CATEGORIES[$i]}
  N=${TRAIN_COUNTS[$i]}
  # print ~4 times per epoch
  STAT_FREQ=$(( (N / BATCH_SIZE) / 4 ))
  if [ "$STAT_FREQ" -lt 1 ]; then STAT_FREQ=1; fi
  echo "=== ${CAT}: n_train=${N} stat_freq=${STAT_FREQ} K=${K_NEIGHBORS}"
  STAT_FREQ=$STAT_FREQ bash "$(dirname "$0")/train_csn.sh" "$CAT" "$K_NEIGHBORS"
done
