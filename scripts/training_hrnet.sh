#!/usr/bin/env bash
# Port of `MinkowskiNet/scripts/training_hrnet.sh`.
set -eo pipefail
source "$(dirname "$0")/partnet_categories.sh"
for CAT in "${CATEGORIES[@]}"; do
  bash "$(dirname "$0")/train_hrnet.sh" "$CAT"
done
