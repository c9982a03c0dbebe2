#!/usr/bin/env bash
# Crash-tolerant supervisor (reference: infinite_run.sh). Unlike the
# reference, each rerun RESUMES from the latest Orbax checkpoint because
# tpu.resume defaults to true.
#
# Exit code 42 (TrainingDiverged, see train.py) is fatal: the divergence
# replays deterministically from the checkpoint, so restarting would
# hot-loop on it — stop and leave the state for the operator.
i=1
while true; do
    echo "Training run $i"
    python train.py "$1"
    code=$?
    if [ "$code" -eq 0 ]; then
        echo "Training finished"
        break
    fi
    if [ "$code" -eq 42 ]; then
        echo "Training diverged (deterministic; not restarting)" >&2
        exit 42
    fi
    i=$((i + 1))
done
