"""Offline diagnostic for the fine-grid (750^2) closure fits.

Separates closure-fit error from online-solver error: for each of the 3
canonical test points, project the cached FOM trajectory onto the
150-mode fine basis and report (a) the pure linear 150-mode projection
error (floor), (b) the closure *reconstruction* error when q_s is
replaced by closure(q_p) at the FOM's own q_p — i.e. the error the
closure ROM would achieve with a perfect online solver. If (b) >> (a)
the closure fit itself is the problem (role of the reference's offline
validators, POD-RBF_global/perform_training*.py, project_training.py).

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/fine_closure_diag.py
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "runners")

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

TEST_POINTS = [(5.19, 0.026), (4.56, 0.019), (4.75, 0.02)]


def snap_file(mu1, mu2):
    return f"param_snaps_750x750/mu1_{mu1}+mu2_{mu2}.npy"


def rel_err(recon, w):
    return 100.0 * np.linalg.norm(recon - w) / np.linalg.norm(w)


def main():
    basis = np.load("basis_750x750.npy")          # (2n, 150) f32
    n_p = 10

    from finitedifference_tpu.closures.gp import gp_closure
    from finitedifference_tpu.closures.rbf import rbf_global_predict
    from finitedifference_tpu.training.gp_train import load_gp
    from finitedifference_tpu.training.rbf_train import load_global_rbf

    rbf = load_global_rbf("pod_rbf_global_model_750x750.npz")
    gp = load_gp("pod_gp_model_per_mode_750x750.npz")

    rbf_f = jax.jit(jax.vmap(lambda y: rbf_global_predict(rbf, y)))
    gp_f = jax.jit(jax.vmap(gp_closure(gp).predict))

    for mu1, mu2 in TEST_POINTS:
        t0 = time.time()
        w = np.load(snap_file(mu1, mu2)).astype(np.float32)  # (2n, 501)
        q = w.T @ basis                                      # (501, 150)
        q_p, q_s = q[:, :n_p], q[:, n_p:]

        lin150 = q @ basis.T                                 # (501, 2n)
        e150 = rel_err(lin150.T, w)

        qs_rbf = np.asarray(rbf_f(jnp.asarray(q_p)))
        qs_gp = np.asarray(gp_f(jnp.asarray(q_p)))

        # reconstruction with closure-predicted q_s
        rec_rbf = q_p @ basis[:, :n_p].T + qs_rbf @ basis[:, n_p:].T
        rec_gp = q_p @ basis[:, :n_p].T + qs_gp @ basis[:, n_p:].T
        e_rbf = rel_err(rec_rbf.T, w)
        e_gp = rel_err(rec_gp.T, w)

        # closure error in coordinate space, relative to q_s magnitude
        c_rbf = 100 * np.linalg.norm(qs_rbf - q_s) / np.linalg.norm(q_s)
        c_gp = 100 * np.linalg.norm(qs_gp - q_s) / np.linalg.norm(q_s)

        # 10-mode-only reconstruction (what a closure predicting q_s=0
        # would give) — the scale of what the closure must explain
        rec10 = q_p @ basis[:, :n_p].T
        e10 = rel_err(rec10.T, w)

        print(f"mu=({mu1},{mu2}): proj150 {e150:.2f}%  proj10 {e10:.2f}%  "
              f"recon RBF {e_rbf:.2f}% (coord {c_rbf:.1f}%)  "
              f"recon GP {e_gp:.2f}% (coord {c_gp:.1f}%)  "
              f"[{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
