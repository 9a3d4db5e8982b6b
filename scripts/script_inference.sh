#!/bin/bash
# Level-sweep inference (reference: scripts/script_inference.sh).
# Usage: bash scripts/script_inference.sh <exp> <data_dir> [tag]

set -e
EXP=${1:?usage: script_inference.sh <exp> <data_dir> [tag]}
DATA_DIR=${2:?need data dir}
TAG=${3:-latest}

python scripts/inference.py \
  --args.load "conf/${EXP}.yml" \
  --ckpt_dir "ckpt/${EXP}" \
  --tag "$TAG" \
  --data_dir "$DATA_DIR" \
  --save_result_dir "results/${EXP}"
