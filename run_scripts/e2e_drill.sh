#!/usr/bin/env bash
# Composed product drill — the full workflow as one command:
# dataset build -> finetune -> 3-stage eval (mean recall must improve)
# -> engine build -> daemon serve -> served features == offline.
# Chip scale trains ViT-B-16 + RoBERTa-base from scratch on the
# learnable synthetic set (~45 min on a tunneled v5e, most of it
# compile + checkpoint pulls; minutes on a real TPU-VM host).
#
#   bash run_scripts/e2e_drill.sh [tiny|chip] [WORKDIR] [OUT.json]

set -euo pipefail

SCALE=${1:-chip}
WORKDIR=${2:-/tmp/nans_drill}
OUT=${3:-DRILL.json}

EXTRA=()
if [ "${SCALE}" = "tiny" ]; then
    EXTRA+=(--platform cpu)
fi

exec python -m nans_clip_tpu.drill --scale "${SCALE}" \
    --workdir "${WORKDIR}" --out "${OUT}" "${EXTRA[@]+"${EXTRA[@]}"}"
