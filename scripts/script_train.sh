#!/bin/bash
# Launch training (reference: scripts/script_train.sh).
# Usage: bash scripts/script_train.sh <exp> [resume]
#   exp:    config name under conf/, e.g. vrvq/vrvq_a2
#   resume: "resume" to continue from the latest checkpoint
#
# On TPU, all local chips are used automatically via the data mesh —
# there is no per-device process fork like torchrun. Multi-host pods:
# run this script on every host with --coordinator/--num_processes/
# --process_id flags appended.

set -e
EXP=${1:?usage: script_train.sh <exp> [resume]}
RESUME=${2:-}

ARGS=(--args.load "conf/${EXP}.yml" --save_path "ckpt/${EXP}")
if [ "$RESUME" = "resume" ]; then
  ARGS+=(--resume true --tag latest)
fi

python scripts/train.py "${ARGS[@]}"
