#!/usr/bin/env bash
# Port of `MinkowskiNet/scripts/download_pretrained_models.sh`: fetch the
# reference's released model archives (Google Drive). The Mink-branch .pth
# checkpoints are torch/ME-format and serve as behavioral references; the
# MID-FC `trained_layers.pth` checkpoints load directly into this framework
# via `csn_tpu/midfc/convert.py` for exact-eval parity.
set -eo pipefail

DEST=${1:-pretrained}
mkdir -p "$DEST"

# File ids from the reference script (HRNetSeg3S, SSA, CSN K=1/2/3 zips).
declare -A FILES=(
  [HRNetSeg3S.zip]="1yXLlU_FUmgOwzr8exbDSAIRin4WEV9Ca"
  [HRNetSimCSN3S_SSA.zip]="1zY2bZpFH6kEVBDbumqbGWB2kbBv_r6mQ"
  [HRNetSimCSN3S_K1.zip]="1IlqX1cDLIV9HBhKQh0rXmN6SD9dXj9qw"
  [HRNetSimCSN3S_K2.zip]="1y6f1WecHnAYUyDrvHp1O0Bw0Q1GYLJJt"
  [HRNetSimCSN3S_K3.zip]="1qlNg5dRnxsgkbIYpGLmzGVQpxTRo51d3"
)

for name in "${!FILES[@]}"; do
  id="${FILES[$name]}"
  out="$DEST/$name"
  if [ -f "$out" ]; then
    echo "$out exists, skipping"
    continue
  fi
  echo "Downloading $name ..."
  # gdown if available, else the cookie dance with curl
  if command -v gdown >/dev/null 2>&1; then
    gdown "https://drive.google.com/uc?id=$id" -O "$out"
  else
    curl -L -o "$out" "https://drive.google.com/uc?export=download&id=$id" \
      || echo "download failed (offline environment?) — fetch manually: " \
              "https://drive.google.com/uc?id=$id"
  fi
done
