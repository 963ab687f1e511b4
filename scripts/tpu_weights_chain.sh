#!/bin/bash
# TPU-side weight builds, in value order, after gen_snapshots_fine.py
# frees the (single) TPU session. Each stage is idempotent; each runs
# in a FRESH interpreter so an axon registration failure in one stage
# cannot poison the next (CLAUDE.md).
set -e
cd "$(dirname "$0")/.."

stage() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

stage "coarse 250^2 weights (device-scored exact LH)"
python scripts/build_fine_weights.py --num-cells 250

stage "fine 95-mode weights"
python scripts/build_fine_weights.py

stage "fine 150-mode weights"
python scripts/build_fine_weights.py --num-modes 150 --snap-stride 14

stage "TPU WEIGHTS DONE"
