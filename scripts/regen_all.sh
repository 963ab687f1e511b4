#!/bin/bash
# Regenerate the full offline artifact tree after a machine reset
# (snapshot cache, POD bases, ECSW weight families, closure fits).
# Everything here is idempotent — rerun after a crash and it resumes.
#
# Stage order matters: snapshots (TPU) feed bases/weights; CPU stages
# run under JAX_PLATFORMS=cpu with axon registration skipped so the one
# TPU session stays free (CLAUDE.md).
#
# Usage: bash scripts/regen_all.sh [--with-fine-closures] 2>&1 | tee regen.log
set -e
cd "$(dirname "$0")/.."

CPU_ENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"

stage() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

stage "coarse snapshots (TPU)"
python scripts/gen_snapshots.py

stage "coarse linear weights (CPU host)"
$CPU_ENV python scripts/build_coarse_weights.py

stage "coarse closure fits (CPU host)"
# --gp-steps 100 --gp-noise 1e-6: the shipped per-mode recipe
# (record_tpu_rows.py fallback); 300 steps is a multi-hour fit on this
# one-core host for no measurable offline gain (gp_offline_eval.py)
$CPU_ENV python scripts/train_closures.py --gp-steps 100 --gp-noise 1e-6

stage "coarse shared-kernel GP (CPU host)"
$CPU_ENV python scripts/train_closures.py --skip rbf rnm \
  --gp-per-mode none --gp-noise 1e-6

stage "AE model + rows (CPU host, 50^2 TestAE scale)"
$CPU_ENV python scripts/record_ae_rows.py

stage "coarse row campaign (TPU; skip-if-done — pass --redo by hand after retrained fits)"
python scripts/record_tpu_rows.py --models rnm pod_rbf_global pod_rbf_searched \
  hprom hprom_ecm hrnm hrnm_ecm pod_rbf_hprom pod_rbf_hprom_knn_searched \
  pod_gp_hprom pod_gp_hprom_pm

stage "fine snapshots (TPU, ~45 min cold)"
python scripts/gen_snapshots_fine.py

stage "fine 95-mode weights (TPU device LH)"
python scripts/build_fine_weights.py

stage "fine 150-mode weights (TPU device LH)"
python scripts/build_fine_weights.py --num-modes 150 --snap-stride 14

if [[ "$1" == "--with-fine-closures" ]]; then
  stage "fine closure fits, 10+140 split (CPU host)"
  $CPU_ENV python scripts/train_closures.py --num-cells 750 \
    --skip rnm --gp-steps 100 --gp-noise 1e-6

  # the reference's own fine workbench moves to 20 primary modes
  # (POD-RBF_global_20/) — at 750^2 the 10-mode primary state is too
  # coarse for the closure map to generalize (fine_closure_diag.py)
  stage "fine closure fits, 20+130 split (CPU host)"
  $CPU_ENV python scripts/train_closures.py --num-cells 750 \
    --num-primary 20 --skip rnm --gp-steps 100 --gp-noise 1e-6

  stage "fine closure offline diagnostic (CPU host)"
  $CPU_ENV python scripts/fine_closure_diag.py || true
  $CPU_ENV python scripts/fine_closure_diag.py --num-primary 20 || true

  # the two splits record under DISTINCT npz keys (pod_rbf_hprom_* vs
  # pod_rbf_hprom_p20_*; record_tpu_rows.py suffixes non-default splits)
  # so both stay skip-if-done and neither clobbers the other (ADVICE r3)
  stage "fine closure campaign (TPU): spread weights + warm start"
  python scripts/record_tpu_rows.py --num-cells 750 \
    --out rom_results_fine.npz \
    --models pod_rbf_hprom pod_gp_hprom_pm \
    --mu-train spread --warm-start

  stage "fine closure campaign, 20-primary split (TPU)"
  python scripts/record_tpu_rows.py --num-cells 750 \
    --out rom_results_fine.npz --num-primary 20 \
    --models pod_rbf_hprom pod_gp_hprom_pm \
    --mu-train spread --warm-start
fi

stage "claims-vs-artifacts acceptance gate (CPU host)"
$CPU_ENV python scripts/check_claims.py --write-report

stage "ALL DONE"
