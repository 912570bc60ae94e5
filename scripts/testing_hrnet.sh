#!/usr/bin/env bash
# Port of `MinkowskiNet/scripts/testing_hrnet.sh`: evaluate one category or
# ALL 17 PartNet L3 categories with the plain HRNetSeg model, then aggregate
# via collect_partnet_results.
#
#   ./scripts/testing_hrnet.sh <Category|all|--show_categories> [base_dir]
set -eo pipefail

source "$(dirname "$0")/partnet_categories.sh"

SHOW_CATS="--show_categories"
MODEL=${MODEL:-HRNetSeg3S}

if [ -z "$1" ]; then
  echo "Usage: $0 <Category|all|$SHOW_CATS> [base_dir]" >&2
  exit 1
fi

if [ "$1" = "$SHOW_CATS" ]; then
  echo "PartNet categories with L3 annotations:"
  echo "---------------------------------------"
  for i in "${!CATEGORIES[@]}"; do
    echo -e "\t$((i + 1)).\t${CATEGORIES[$i]}"
  done
  exit 0
fi

CAT=$1
BASE=${2:-outputs}
DATAPATH=${DATAPATH:-"./data/partnet"}

resolve_log_dir() {
  local cat=$1
  find "$BASE" -path "*/${cat}/${MODEL}/*" \
      \( -name "weights.msgpack" -o -name "checkpoint.msgpack" \) \
      -printf '%T@ %h\n' 2>/dev/null | sort -rn | head -1 | cut -d' ' -f2-
}

if [ "$CAT" = "all" ] && [ -n "${LOG_DIR:-}" ]; then
  echo "ERROR: LOG_DIR is a single-category override — with 'all' it would" >&2
  echo "evaluate every category against the same checkpoint dir. Unset it." >&2
  exit 1
fi

FOUND=false
FAILED=()
for i in "${!CATEGORIES[@]}"; do
  C=${CATEGORIES[$i]}
  if [ "$CAT" = "$C" ] || [ "$CAT" = "all" ]; then
    FOUND=true
    DIR=${LOG_DIR:-$(resolve_log_dir "$C")}
    if [ -z "$DIR" ]; then
      echo "!!! no checkpoint found for ${C} under ${BASE} — skipping" >&2
      FAILED+=("$C")
      continue
    fi
    echo "=== ${C}: evaluating ${DIR}"
    SAVE_PRED_DIR="${DIR}/${C}_evaluation/results" \
      bash "$(dirname "$0")/test_hrnet.sh" "$C" "$DIR" || FAILED+=("$C")
  fi
done

if [ "$FOUND" = false ]; then
  echo "ERROR: '$CAT' is not a PartNet category with L3 annotations" >&2
  exit 1
fi

if [ "$CAT" = "all" ]; then
  echo "=== aggregate (collect_partnet_results over ${BASE})"
  python -m csn_tpu.tasks.collect_partnet_results --results_root "$BASE" || true
  if [ "${#FAILED[@]}" -gt 0 ]; then
    echo "!!! categories with no result: ${FAILED[*]}" >&2
  fi
  # fail only when NOTHING evaluated (partial collections still aggregate)
  if [ "${#FAILED[@]}" -eq "${#CATEGORIES[@]}" ]; then
    exit 1
  fi
else
  # single named category: its failure IS the script's failure (callers and
  # session drivers key on the exit code)
  if [ "${#FAILED[@]}" -gt 0 ]; then
    echo "!!! evaluation failed for: ${FAILED[*]}" >&2
    exit 1
  fi
fi
