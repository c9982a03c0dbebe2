#!/usr/bin/env bash
# Crash-tolerant supervisor (reference: infinite_run.sh). Unlike the
# reference, each rerun RESUMES from the latest Orbax checkpoint because
# tpu.resume defaults to true.
i=1
while true; do
    echo "Training run $i"
    python train.py "$1"
    i=$((i + 1))
done
