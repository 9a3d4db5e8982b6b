#!/bin/bash
# Long-running training launch example (reference: scripts/main.sh).
# All local TPU chips participate via the data mesh; nohup + log file.
EXP=${1:-vrvq/vrvq_a2}
mkdir -p logs
nohup bash scripts/script_train.sh "$EXP" > "logs/${EXP//\//_}.log" 2>&1 &
echo "launched $EXP -> logs/${EXP//\//_}.log (pid $!)"
