#!/bin/bash
# Multi-host pod training launch (reference: scripts/script_train_multi.sh,
# which used torch.distributed.run). Run this on EVERY host of the pod:
#   bash scripts/script_train_multi.sh <exp> <coordinator_ip:port> <num_hosts> <host_id>
# Within each host, all local TPU chips join the data mesh automatically.

set -e
EXP=${1:?usage: script_train_multi.sh <exp> <coordinator> <num_hosts> <host_id>}
COORD=${2:?need coordinator ip:port}
NUM=${3:?need num_hosts}
ID=${4:?need host_id}

python scripts/train.py \
  --args.load "conf/${EXP}.yml" \
  --save_path "ckpt/${EXP}" \
  --coordinator "$COORD" \
  --num_processes "$NUM" \
  --process_id "$ID"
