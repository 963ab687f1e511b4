#!/bin/bash
# Round-5 fine-closure campaign chain (VERDICT r4 #3/#4): regenerate the
# fine artifact tree on a reset machine and record the ONLINE
# pod_rbf_hprom_p20_dense / pod_gp_hprom_pm_p20_dense rows at 750^2.
#
# A focused subset of regen_all.sh --with-fine-closures: skips the
# coarse stages (their npz rows are committed and skip-if-done) and the
# two legacy fine-closure fit stages, going straight to the dense
# 25-trajectory fits the round-4/5 offline study validated. Same
# stage/provenance discipline as regen_all.sh.
#
# Usage: bash scripts/round5_fine_chain.sh [wait_pid] 2>&1 | tee -a fine_chain.log
set -e
cd "$(dirname "$0")/.."

CPU_ENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"
PROV=regen_provenance.txt

stage() {
  local bound=$1 name=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name (bound ${bound}s) ==="
  local t0=$SECONDS rc=0
  timeout "$bound" "$@" && rc=0 || rc=$?
  echo "$(date -Is) rc=$rc $((SECONDS - t0))s  $name" >> "$PROV"
  [ $rc -ne 0 ] && echo "STAGE FAILED rc=$rc: $name"
  return $rc
}

# optionally wait for in-flight generator processes (snapshots, an
# early basis build) so no stage races a duplicate of itself
for pid in "$@"; do
  echo "waiting for pid $pid"
  while kill -0 "$pid" 2>/dev/null; do sleep 15; done
done

stage 7200 "fine snapshots (TPU; resumes/skips if cached)" \
  python scripts/gen_snapshots_fine.py

stage 7200 "fine 150-mode basis (CPU host rSVD from snapshot cache)" \
  $CPU_ENV python -c "
import sys; sys.path.insert(0, '.'); sys.path.insert(0, 'runners')
import numpy as np
from finitedifference_tpu.config import DEFAULT_CONFIG
from finitedifference_tpu.grid import grid_from_config
from common import get_or_build_basis
cfg = DEFAULT_CONFIG.with_cells(750)
grid = grid_from_config(cfg)
b = get_or_build_basis(cfg, grid, np.ones(grid.state_dim), 150)
print('basis', b.shape)
"

stage 7200 "fine mu-densified qcoords, 5x5 grid (TPU device FOM)" \
  python scripts/gen_fine_qcoords.py --grid-size 5

stage 10800 "fine dense RBF fits + offline validation (CPU host)" \
  $CPU_ENV python scripts/fine_closure_fit.py --num-primary 20 \
  --models rbf rbf_aniso --save

stage 14400 "fine closure campaign, 20-primary dense RBF (TPU)" \
  python scripts/record_tpu_rows.py --num-cells 750 \
  --out rom_results_fine.npz --num-primary 20 --fit-suffix _dense \
  --models pod_rbf_hprom --mu-train spread --warm-start

# GP last: the per-mode hyperopt is the most expensive CPU stage
# (cubic in pairs x 130 modes on this one-core host) — bound the pair
# count so the fit lands inside the round (offline-validated below
# before the online rows record).
stage 14400 "fine dense per-mode GP fit + offline validation (CPU host)" \
  $CPU_ENV python scripts/fine_closure_fit.py --num-primary 20 \
  --models gp --max-pairs 1600 --save

stage 14400 "fine closure campaign, 20-primary dense GP (TPU)" \
  python scripts/record_tpu_rows.py --num-cells 750 \
  --out rom_results_fine.npz --num-primary 20 --fit-suffix _dense \
  --models pod_gp_hprom_pm --mu-train spread --warm-start

stage 600 "acceptance gate" \
  $CPU_ENV python scripts/check_claims.py --write-report

echo "ROUND5 FINE CHAIN DONE"
