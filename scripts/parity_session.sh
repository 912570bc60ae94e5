#!/usr/bin/env bash
# One-command first-online-session parity run (PARITY.md §§1-4, VERDICT r3
# #6): download the released checkpoints, then convert -> evaluate ->
# collect -> assert every category against the published IoU tables with the
# documented tolerances. Exit 0 iff everything executed passed.
#
# Usage:
#   scripts/parity_session.sh <midfc_ckpts> <midfc_features> <partnet_root> \
#       [mink_ckpts] [knn_graphs] [out_dir] [extra parity_session.py flags...]
#
#   <midfc_ckpts>    dir with <Cat>/trained_layers.pth  ('-' to skip branch)
#   <midfc_features> root with {train,test}/<Cat>/{fc_1,point_labels}
#   <partnet_root>   PartNet h5 root ('-' to skip the Mink branch)
#   [mink_ckpts]     dir with <Cat>/weights.pth (default: pretrained/
#                    HRNetSimCSN3S_K1_models after download; the archive may
#                    nest one folder — point inside it if so; '-' to skip)
#   [knn_graphs]     root with n_heads_8/<Cat>/{train,test}.npy
#   [out_dir]        report dir (default outputs/parity)
#
# Synthetic rehearsal (no network, asserts the plumbing end-to-end):
#   tests/test_cli.py::test_parity_session_synthetic
set -eo pipefail
cd "$(dirname "$0")/.."

MIDFC_CKPTS=${1:?usage: parity_session.sh <midfc_ckpts> <midfc_features> <partnet_root> [mink_ckpts] [knn_graphs] [out_dir]}
MIDFC_FEATS=${2:?need <midfc_features>}
PARTNET=${3:?need <partnet_root> (or '-')}
shift 3

# optional positionals stop at the first flag, so pass-through flags work
# with fewer than 6 positionals ('-' is a valid positional skip sentinel)
is_positional() { [ "$1" = "-" ] || [ "${1#-}" = "$1" ]; }
MINK_CKPTS=pretrained/HRNetSimCSN3S_K1_models
KNN_GRAPHS=
OUT=outputs/parity
if [ $# -gt 0 ] && is_positional "$1"; then MINK_CKPTS=$1; shift; fi
if [ $# -gt 0 ] && is_positional "$1"; then KNN_GRAPHS=$1; shift; fi
if [ $# -gt 0 ] && is_positional "$1"; then OUT=$1; shift; fi

# §1 step 1: fetch + extract the released archives when the checkpoint dirs
# are absent (download_pretrained_models.sh validates and unzips each one;
# offline it prints the manual URLs and this script then fails loudly on the
# missing files).
if [ "$MIDFC_CKPTS" != "-" ] && [ ! -d "$MIDFC_CKPTS" ]; then
  bash scripts/download_pretrained_models.sh "$(dirname "$MIDFC_CKPTS")"
fi
if [ "$PARTNET" != "-" ] && [ "$MINK_CKPTS" != "-" ] \
   && [ ! -d "$MINK_CKPTS" ]; then
  bash scripts/download_pretrained_models.sh "$(dirname "$MINK_CKPTS")"
fi

ARGS=(--out "$OUT")
if [ "$MIDFC_CKPTS" != "-" ]; then
  ARGS+=(--midfc_ckpts "$MIDFC_CKPTS" --midfc_features "$MIDFC_FEATS")
fi
if [ -n "$KNN_GRAPHS" ] && [ "$KNN_GRAPHS" != "-" ]; then
  ARGS+=(--knn_graphs "$KNN_GRAPHS")
fi
if [ "$PARTNET" != "-" ] && [ "$MINK_CKPTS" != "-" ]; then
  ARGS+=(--mink_ckpts "$MINK_CKPTS" --partnet "$PARTNET")
fi

exec python -m csn_tpu.tasks.parity_session "${ARGS[@]}" "$@"
