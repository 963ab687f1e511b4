"""Offline diagnostic for the fine-grid (750^2) closure fits.

Separates closure-fit error from online-solver error: for each of the 3
canonical test points, project the cached FOM trajectory onto the
150-mode fine basis and report (a) the pure linear 150-mode projection
error (floor), (b) the closure *reconstruction* error when q_s is
replaced by closure(q_p) at the FOM's own q_p — i.e. the error the
closure ROM would achieve with a perfect online solver. If (b) >> (a)
the closure fit itself is the problem (role of the reference's offline
validators, POD-RBF_global/perform_training*.py, project_training.py).

--num-primary selects the primary/secondary split (the reference's fine
workbench explores 20 primary modes, POD-RBF_global_20/); artifacts
carry the same _p{n} suffix train_closures.py writes.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       python scripts/fine_closure_diag.py [--num-primary 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "runners")

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

TEST_POINTS = [(5.19, 0.026), (4.56, 0.019), (4.75, 0.02)]


def rel_err(recon, w):
    return 100.0 * np.linalg.norm(recon - w) / np.linalg.norm(w)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-primary", type=int, default=10)
    p.add_argument("--num-cells", type=int, default=750)
    args = p.parse_args()
    n_p = args.num_primary
    res = f"_{args.num_cells}x{args.num_cells}" if args.num_cells != 250 \
        else ""
    sfx = "" if n_p == 10 else f"_p{n_p}"

    basis = np.load(f"basis{res}.npy")                # (2n, 150)

    from finitedifference_tpu.closures.gp import gp_closure
    from finitedifference_tpu.closures.rbf import rbf_global_predict
    from finitedifference_tpu.training.gp_train import load_gp
    from finitedifference_tpu.training.rbf_train import load_global_rbf

    rbf_f = gp_f = None
    rbf_path = f"pod_rbf_global_model{sfx}{res}.npz"
    gp_path = f"pod_gp_model_per_mode{sfx}{res}.npz"
    if os.path.exists(rbf_path):
        rbf = load_global_rbf(rbf_path)
        rbf_f = jax.jit(jax.vmap(lambda y: rbf_global_predict(rbf, y)))
    if os.path.exists(gp_path):
        gp = load_gp(gp_path)
        gp_f = jax.jit(jax.vmap(gp_closure(gp).predict))
    print(f"split {n_p}+{150 - n_p}: rbf={rbf_path if rbf_f else 'MISSING'}"
          f" gp={gp_path if gp_f else 'MISSING'}", flush=True)

    for mu1, mu2 in TEST_POINTS:
        t0 = time.time()
        w = np.load(f"param_snaps{res}/mu1_{mu1}+mu2_{mu2}.npy"
                    ).astype(np.float32)              # (2n, 501)
        q = w.T @ basis                               # (501, 150)
        q_p, q_s = q[:, :n_p], q[:, n_p:]

        e150 = rel_err((q @ basis.T).T, w)
        # n_p-mode-only reconstruction (a closure predicting q_s=0) —
        # the scale of what the closure must explain
        e_np = rel_err((q_p @ basis[:, :n_p].T).T, w)

        line = (f"mu=({mu1},{mu2}): proj150 {e150:.2f}%  "
                f"proj{n_p} {e_np:.2f}%")
        for name, f in (("RBF", rbf_f), ("GP", gp_f)):
            if f is None:
                continue
            qs_hat = np.asarray(f(jnp.asarray(q_p)))
            rec = q_p @ basis[:, :n_p].T + qs_hat @ basis[:, n_p:].T
            c = 100 * np.linalg.norm(qs_hat - q_s) / np.linalg.norm(q_s)
            line += f"  recon {name} {rel_err(rec.T, w):.2f}% (coord {c:.1f}%)"
        print(line + f"  [{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
