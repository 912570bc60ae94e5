#!/usr/bin/env bash
# Port of `MinkowskiNet/scripts/testing_csn.sh:1-40`: evaluate one category or
# ALL 17 PartNet L3 categories with the CSN model, then aggregate the
# published-table rows via collect_partnet_results.
#
#   ./scripts/testing_csn.sh <Category|all|--show_categories> <K> [base_dir]
#
# base_dir (default outputs/) is scanned per category for the newest run dir
# containing a checkpoint (the train scripts' LOG_DIR layout); override a
# single category's dir with LOG_DIR=...
set -eo pipefail

source "$(dirname "$0")/partnet_categories.sh"

SHOW_CATS="--show_categories"
MODEL=${MODEL:-HRNetSimCSN3S}

if [ -z "$1" ]; then
  echo "Usage: $0 <Category|all|$SHOW_CATS> <K> [base_dir]" >&2
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

if [ -z "$2" ]; then
  echo "Specify the number of neighbors (0 for SSA, 1/2/3 for CSA)" >&2
  exit 1
fi

CAT=$1
K_NEIGHBORS=$2
BASE=${3:-outputs}
DATAPATH=${DATAPATH:-"./data/partnet"}

resolve_log_dir() {
  # newest run dir under $BASE/**/<category>/<model>-K<k>/** holding a ckpt
  local cat=$1
  find "$BASE" -path "*/${cat}/${MODEL}-K${K_NEIGHBORS}/*" \
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
    echo "=== ${C}: evaluating ${DIR} (K=${K_NEIGHBORS})"
    SAVE_PRED_DIR="${DIR}/${C}_evaluation/results" \
      bash "$(dirname "$0")/test_csn.sh" "$C" "$DIR" "$K_NEIGHBORS" || \
      FAILED+=("$C")
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
