#!/bin/bash
# Single-host launch (reference: scripts/script_train_single.sh).
# All local chips join the data mesh — no per-device process fork needed.
exec bash "$(dirname "$0")/script_train.sh" "$@"
