"""Regression/benchmark driver for the hyper-reduced family (reference
run_tests_HPROM.py): HPROM / HRNM / POD-RBF-HPROM / POD-GP-HPROM at the 3
canonical test points -> rom_results_hprom.npz."""

import argparse
import os
import time

import numpy as np

from common import default_config, run_with_retry, setup_jax
from run_tests import TEST_POINTS


def main(models=("hprom", "hrnm", "pod_rbf_hprom", "pod_gp_hprom"),
         out="rom_results_hprom.npz", num_cells=None, num_steps=None,
         f32=False, redo=False):
    setup_jax(f32)
    import run_hprom
    import run_hrnm
    import run_pod_gp_hprom
    import run_pod_rbf_hprom

    runner_by_name = {
        "hprom": lambda mu: run_hprom.main(
            mu[0], mu[1], num_cells=num_cells, num_steps=num_steps,
            f32=f32),
        "hrnm": lambda mu: run_hrnm.main(
            mu[0], mu[1], num_cells=num_cells, num_steps=num_steps,
            f32=f32),
        "pod_rbf_hprom": lambda mu: run_pod_rbf_hprom.main(
            mu[0], mu[1], num_cells=num_cells, num_steps=num_steps,
            f32=f32),
        "pod_gp_hprom": lambda mu: run_pod_gp_hprom.main(
            mu[0], mu[1], num_cells=num_cells, num_steps=num_steps,
            f32=f32),
    }

    results = dict(np.load(out, allow_pickle=True)) \
        if os.path.exists(out) else {}
    if redo:
        stale = {f"{m}_{mu[0]}_{mu[1]}"
                 for m in models for mu in TEST_POINTS}
        results = {k: v for k, v in results.items() if k not in stale}
    for mu in TEST_POINTS:
        for name in models:
            key = f"{name}_{mu[0]}_{mu[1]}"
            if key in results:
                print(f"skipping {key} (done)")
                continue
            print(f"=== {name} at mu = {mu} ===")
            elapsed, err = run_with_retry(runner_by_name[name], mu)
            if elapsed is None:
                print(f"  {key} FAILED after retries; continuing")
                continue
            results[key] = np.array([elapsed, err])
            np.savez(out, **results)
    print(f"results accumulated in {out}")
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+",
                   default=["hprom", "hrnm", "pod_rbf_hprom",
                            "pod_gp_hprom"])
    p.add_argument("--out", default="rom_results_hprom.npz")
    p.add_argument("--num-cells", type=int, default=None)
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--f32", action="store_true")
    p.add_argument("--redo", action="store_true",
                   help="re-run the selected models even if recorded")
    a = p.parse_args()
    main(tuple(a.models), a.out, a.num_cells, a.num_steps, a.f32,
         a.redo)
