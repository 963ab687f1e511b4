"""Probe the fine (750^2) closure-HPROM divergence: run the global-RBF
sampled manifold ROM on the CPU backend in f64 with the SAME recorded
weight set the TPU rows used. Distinguishes bad ECSW weights (CPU f64
also diverges) from online-precision effects (CPU f64 tracks).

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/fine_closure_probe.py [--full] [--mu1 5.19 --mu2 0.026]
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "runners")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from common import default_config, make_problem, run_manifold  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mu1", type=float, default=5.19)
    p.add_argument("--mu2", type=float, default=0.026)
    p.add_argument("--full", action="store_true",
                   help="full-mesh manifold PROM instead of sampled")
    p.add_argument("--weights", default="ecsw_weights_rbf_global_nnls_750x750.npy")
    a = p.parse_args()

    cfg = default_config(750)
    grid, w0 = make_problem(cfg)

    from run_pod_rbf_global import get_global_rbf

    u_p, u_s, closure = get_global_rbf(cfg, grid, w0, 10, 140)
    weights = None if a.full else np.load(a.weights)
    if weights is not None:
        print(f"N_e = {int((weights != 0).sum())}")
    run_manifold(cfg, grid, w0, u_p, u_s, closure, a.mu1, a.mu2,
                 weights_full=weights,
                 label="fine-RBF-probe" + ("-full" if a.full else ""))


if __name__ == "__main__":
    main()
