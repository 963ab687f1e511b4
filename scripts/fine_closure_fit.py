"""Offline fine-closure fitting + HELD-OUT validation (VERDICT r3 #1).

Fits the 750^2 closure models on the mu-DENSIFIED coordinate set
(scripts/gen_fine_qcoords.py) and measures, BEFORE any online run, the
reconstruction error each fit would achieve with a perfect online
solver at the 3 canonical test points. With an orthonormal basis the
full-state error decomposes exactly in coordinate space:

    ||w - rec||^2 = (||w||^2 - ||q||^2) + ||q_s - closure(q_p)||^2
                     `-- 150-mode floor --'

so no 2.25 GB snapshot ever loads here — everything runs from the
(501, 150) q files (reference offline-validator role:
POD-RBF_global/perform_training*.py, project_training.py; the
20-primary split is POD-RBF_global_20/, the anisotropic fine-tune is
perform_training_bayesian_optimization_anisotropic_fine_tuned.py:44).

Candidates per --num-primary split:
  rbf        grid-searched isotropic global RBF (train_global_rbf)
  rbf_aniso  per-dimension length scales (fit_global_rbf_anisotropic)
  gp         per-mode ARD GPs (train_gp per_mode='full')
Each optionally with --mu-inputs: append the (scaled) parameter point
to the primary coordinates (the closure becomes q_s(q_p, mu); online
solvers fix mu per run — rnm_closure_with_mu precedent).

--save writes the winning artifacts under the *_p{n}_dense naming that
record_tpu_rows --fit-suffix _dense consumes.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       python scripts/fine_closure_fit.py --num-primary 20 --save
"""

import argparse
import glob
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "runners"))

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

QDIR = "fine_qcoords"


def load_set(num_total, n_p, max_pairs, mu_inputs, test=False):
    """(inputs, q_s, per-file list of (mu, q, w_norm))."""
    pat = ("test_*.npz" if test else "*.npz")
    files = sorted(f for f in glob.glob(os.path.join(QDIR, pat))
                   if test or not os.path.basename(f).startswith("test_"))
    per_traj = max(1, (max_pairs or 10 ** 9) // max(len(files), 1))
    rows_in, rows_out, metas = [], [], []
    for f in files:
        z = np.load(f)
        q = z["q"][:, :num_total].astype(np.float64)
        mu = z["mu"]
        metas.append((tuple(np.round(mu, 6)), q, float(z["w_norm"])))
        stride = 1 if test else max(1, -(-q.shape[0] // per_traj))
        qq = q[::stride]
        inp = qq[:, :n_p]
        if mu_inputs:
            # scale mu onto the q_p magnitude range so the shared
            # isotropic kernel treats it as a comparable coordinate
            mu_feat = np.tile(mu_scaled(mu), (qq.shape[0], 1))
            inp = np.concatenate([inp, inp[:, :1] * 0 + mu_feat], axis=1)
        rows_in.append(inp)
        rows_out.append(qq[:, n_p:])
    return (np.concatenate(rows_in), np.concatenate(rows_out), metas)


def mu_scaled(mu):
    """Map (mu1, mu2) into roughly the primary-coordinate scale."""
    return np.array([(mu[0] - 4.875) / 0.625 * 100.0,
                     (mu[1] - 0.0225) / 0.0075 * 100.0])


def validate(predict, metas, n_p, mu_inputs, label):
    """Held-out reconstruction errors at the test points."""
    outs = []
    for mu, q, w_norm in metas:
        q_p, q_s = q[:, :n_p], q[:, n_p:]
        inp = q_p
        if mu_inputs:
            mu_feat = np.tile(mu_scaled(np.asarray(mu)),
                              (q_p.shape[0], 1))
            inp = np.concatenate([q_p, mu_feat], axis=1)
        qs_hat = np.asarray(predict(jnp.asarray(inp)))
        floor2 = max(w_norm ** 2 - np.linalg.norm(q) ** 2, 0.0)
        e150 = 100 * np.sqrt(floor2) / w_norm
        rec = 100 * np.sqrt(floor2 + np.linalg.norm(qs_hat - q_s) ** 2) \
            / w_norm
        coord = 100 * np.linalg.norm(qs_hat - q_s) / np.linalg.norm(q_s)
        outs.append((mu, e150, rec, coord))
        print(f"  {label} mu={mu}: recon {rec:.2f}% "
              f"(proj150 floor {e150:.2f}%, coord {coord:.1f}%)",
              flush=True)
    return outs


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-primary", type=int, default=20)
    p.add_argument("--num-total", type=int, default=150)
    p.add_argument("--max-pairs", type=int, default=2600)
    p.add_argument("--models", nargs="+",
                   default=["rbf", "rbf_aniso", "gp"])
    p.add_argument("--mu-inputs", action="store_true")
    p.add_argument("--gp-steps", type=int, default=100)
    p.add_argument("--aniso-steps", type=int, default=300)
    p.add_argument("--save", action="store_true",
                   help="write winning artifacts (*_p{n}_dense naming)")
    p.add_argument("--num-cells", type=int, default=750)
    a = p.parse_args()
    n_p = a.num_primary
    res = f"_{a.num_cells}x{a.num_cells}" if a.num_cells != 250 else ""
    sfx = ("" if n_p == 10 else f"_p{n_p}") + "_dense" \
        + ("_mu" if a.mu_inputs else "")

    inp, q_s, _ = load_set(a.num_total, n_p, a.max_pairs, a.mu_inputs)
    _, _, test_metas = load_set(a.num_total, n_p, None, a.mu_inputs,
                                test=True)
    n_traj = len(glob.glob(os.path.join(QDIR, "mu1_*.npz")))
    print(f"training pairs {inp.shape} from {n_traj} trajectories; "
          f"split {n_p}+{a.num_total - n_p}; mu_inputs={a.mu_inputs}",
          flush=True)

    from finitedifference_tpu.closures.rbf import rbf_global_predict
    from finitedifference_tpu.training.rbf_train import (
        fit_global_rbf_anisotropic,
        save_global_rbf,
        train_global_rbf,
    )

    results = {}
    if "rbf" in a.models:
        t0 = time.time()
        rbf, log = train_global_rbf(inp, q_s, verbose=True)
        print(f"rbf fit {time.time() - t0:.0f}s: {log['best']}",
              flush=True)
        f = jax.jit(jax.vmap(lambda y: rbf_global_predict(rbf, y)))
        results["rbf"] = (rbf, validate(f, test_metas, n_p,
                                        a.mu_inputs, "rbf"))
    if "rbf_aniso" in a.models:
        t0 = time.time()
        rbfa, loga = fit_global_rbf_anisotropic(
            inp, q_s, num_steps=a.aniso_steps, verbose=True)
        print(f"rbf_aniso fit {time.time() - t0:.0f}s", flush=True)
        f = jax.jit(jax.vmap(lambda y: rbf_global_predict(rbfa, y)))
        results["rbf_aniso"] = (rbfa, validate(f, test_metas, n_p,
                                               a.mu_inputs,
                                               "rbf_aniso"))
    if "gp" in a.models:
        from finitedifference_tpu.closures.gp import gp_closure
        from finitedifference_tpu.training.gp_train import (
            save_gp,
            train_gp,
        )
        t0 = time.time()
        gp = train_gp(inp, q_s, noise=1e-6, per_mode="full",
                      num_steps=a.gp_steps, verbose=True)
        print(f"gp fit {time.time() - t0:.0f}s", flush=True)
        f = jax.jit(jax.vmap(gp_closure(gp).predict))
        results["gp"] = (gp, validate(f, test_metas, n_p, a.mu_inputs,
                                      "gp"))

    print("\n=== summary (held-out reconstruction %, 3 test points) ===")
    for name, (_, rows) in results.items():
        errs = [r[2] for r in rows]
        print(f"{name:10s}: " + "  ".join(f"{e:.2f}%" for e in errs)
              + f"   worst {max(errs):.2f}%")

    if a.save:
        if "rbf" in results and "rbf_aniso" in results:
            worst_iso = max(r[2] for r in results["rbf"][1])
            worst_an = max(r[2] for r in results["rbf_aniso"][1])
            best_rbf = results["rbf_aniso"][0] if worst_an < worst_iso \
                else results["rbf"][0]
        elif "rbf_aniso" in results:
            best_rbf = results["rbf_aniso"][0]
        else:
            best_rbf = results.get("rbf", (None,))[0]
        if best_rbf is not None:
            path = f"pod_rbf_global_model{sfx}{res}.npz"
            save_global_rbf(best_rbf, path)
            print(f"saved {path}")
        if "gp" in results:
            path = f"pod_gp_model_per_mode{sfx}{res}.npz"
            save_gp(results["gp"][0], path)
            print(f"saved {path}")


if __name__ == "__main__":
    main()
