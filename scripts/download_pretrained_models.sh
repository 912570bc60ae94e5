#!/usr/bin/env bash
# Port of `MinkowskiNet/scripts/download_pretrained_models.sh`: fetch AND
# EXTRACT the reference's released model archives (Google Drive), plus the
# MID-FC `pretrained_models` archive (`MID-FC/README.md:86`). The Mink-branch
# .pth checkpoints are torch/ME-format and serve as behavioral references;
# the MID-FC `trained_layers.pth` checkpoints load directly into this
# framework via `csn_tpu/midfc/convert.py` for exact-eval parity.
#
# Mirrors the reference's flow (download -> unzip -> rm archive) and its
# Drive confirm-token cookie dance; adds what the reference lacks: curl
# fallback, zip-integrity validation before extraction (Drive serves an HTML
# virus-scan page for unconfirmed large files — saving that as the .zip and
# then "skipping because it exists" would pin a corrupt file forever), and
# per-archive extraction dirs so the layout is deterministic.
set -eo pipefail

DEST=${1:-pretrained}
mkdir -p "$DEST"

# File ids VERBATIM from the reference's download script (MODELS_ID in
# `MinkowskiNet/scripts/download_pretrained_models.sh`) + the MID-FC
# pretrained archive (`MID-FC/README.md:86`).
declare -A FILES=(
  [HRNetSeg3S_models.zip]="1WIOii5OzrzYfyg2mX40cQZjYOvaOdnWE"
  [HRNetSimCSN3S_SSA_models.zip]="1MxD-7Gra09CCcGo59b6ogmjEy3ML4Kt9"
  [HRNetSimCSN3S_K1_models.zip]="1TrlFsdUfqWcw-135hgLJMLbsoS1DULBQ"
  [HRNetSimCSN3S_K2_models.zip]="1sTSGVlStY5Zx5iEyK8_NDA1hyzWxsFjW"
  [HRNetSimCSN3S_K3_models.zip]="1YHh_qFSFJCWZliLbcGoEwlPGzSwIPmqW"
  [midfc_pretrained_models.zip]="1I71Yv3zS0DP75FwaM8l3ahNUia98f4mk"
)

gdrive_download() {  # <id> <out>: the reference's confirm-token dance
  if command -v gdown >/dev/null 2>&1; then
    gdown "https://drive.google.com/uc?id=$1" -O "$2" && return 0
    return 1
  fi
  if command -v wget >/dev/null 2>&1; then
    local confirm
    confirm=$(wget --quiet --save-cookies /tmp/csn_cookies.txt \
      --keep-session-cookies --no-check-certificate \
      "https://docs.google.com/uc?export=download&id=$1" -O- \
      | sed -rn 's/.*confirm=([0-9A-Za-z_]+).*/\1\n/p' | head -1)
    wget --load-cookies /tmp/csn_cookies.txt \
      "https://docs.google.com/uc?export=download&confirm=${confirm}&id=$1" \
      -O "$2"
    local rc=$?
    rm -f /tmp/csn_cookies.txt
    return $rc
  fi
  # curl fallback: -f so HTTP error bodies are not saved as the archive
  curl -fL -o "$2" "https://drive.google.com/uc?export=download&id=$1"
}

for name in "${!FILES[@]}"; do
  id="${FILES[$name]}"
  dir="$DEST/${name%.zip}"
  out="$DEST/$name"
  if [ -d "$dir" ]; then
    echo "$dir exists, skipping"
    continue
  fi
  echo "Downloading $name ..."
  if ! gdrive_download "$id" "$out"; then
    rm -f "$out"
    echo "download failed (offline environment?) — fetch manually:"
    echo "  https://drive.google.com/uc?id=$id  ->  $out"
    continue
  fi
  # Validate before extracting: an HTML confirm page is not a zip. Corrupt
  # downloads are deleted so a rerun retries instead of skipping.
  if ! unzip -tqq "$out" >/dev/null 2>&1; then
    echo "ERROR: $out is not a valid zip (Drive confirm page or truncated" \
         "download) — removing; rerun or fetch manually:" \
         "https://drive.google.com/uc?id=$id"
    rm -f "$out"
    continue
  fi
  mkdir -p "$dir"
  unzip -q "$out" -d "$dir"
  rm -f "$out"
  echo "extracted to $dir"
done
