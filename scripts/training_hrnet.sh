#!/usr/bin/env bash
# Port of `MinkowskiNet/scripts/training_hrnet.sh`.
set -eo pipefail
CATEGORIES=(Bed Bottle Chair Clock Dishwasher Display Door Earphone Faucet \
            Knife Lamp Microwave Refrigerator StorageFurniture Table \
            TrashCan Vase)
for CAT in "${CATEGORIES[@]}"; do
  bash "$(dirname "$0")/train_hrnet.sh" "$CAT"
done
