"""Smoke tests for the runner CLIs: tiny configs, real end-to-end flows
(offline artifacts -> online ROM -> error report) in an isolated cwd."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "runners"))


@pytest.fixture()
def runner_cwd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


SMALL = dict(num_cells=12, num_steps=8)


class TestRunnerSmoke:
    def test_fom_and_prom(self, runner_cwd):
        import run_fom
        import run_prom

        elapsed, _ = run_fom.main(4.75, 0.02, **SMALL)
        # non-default resolutions get their own snapshot folder
        assert os.path.exists("param_snaps_12x12/mu1_4.75+mu2_0.02.npy")
        elapsed, err = run_prom.main(4.75, 0.02, num_modes=6, **SMALL)
        assert err < 5.0
        assert os.path.exists("basis_12x12.npy")

    def test_hprom(self, runner_cwd):
        import run_hprom

        _, err = run_hprom.main(4.75, 0.02, num_modes=6, compute_ecsw=True,
                                bc_w=5.0, **SMALL)
        assert err < 5.0
        assert os.path.exists("ecsw_weights_lspg_12x12.npy")

    def test_hprom_alternate_weight_methods(self, runner_cwd):
        """sequential / multilevel(-fista) weight recipes are runnable
        end-to-end and land their own per-method artifacts (VERDICT r2
        #6/#9); errors match the plain-NNLS mesh's ballpark."""
        import run_hprom

        _, err_seq = run_hprom.main(
            4.75, 0.02, num_modes=6, compute_ecsw=True, bc_w=5.0,
            weights_method="sequential", **SMALL)
        assert os.path.exists("ecsw_weights_lspg_sequential_12x12.npy")
        assert err_seq < 5.0
        _, err_ml = run_hprom.main(
            4.75, 0.02, num_modes=6, compute_ecsw=True, bc_w=5.0,
            weights_method="multilevel", **SMALL)
        assert os.path.exists("ecsw_weights_lspg_multilevel_12x12.npy")
        assert err_ml < 5.0

    def test_pod_rbf_global(self, runner_cwd):
        import run_pod_rbf_global

        _, err = run_pod_rbf_global.main(4.75, 0.02, num_primary=3,
                                         num_secondary=5, **SMALL)
        assert err < 10.0

    def test_pod_gp_hprom_per_mode(self, runner_cwd):
        """Per-mode ARD GP closure (reference POD-GP/compute_gp_models.py
        family) end-to-end through the hyper-reduced runner: retrain with
        per_mode='full', build ECSW weights with the inner GN coordinate
        fit, run the sampled-mesh online solve."""
        import run_pod_gp_hprom

        _, err = run_pod_gp_hprom.main(
            4.75, 0.02, num_primary=3, num_secondary=5,
            compute_ecsw=True, bc_w=5.0, retrain=True, per_mode="full",
            **SMALL)
        assert np.isfinite(err) and err < 10.0
        assert os.path.exists("pod_gp_model_12x12.npz")

    def test_pod_gp_hprom_variational(self, runner_cwd):
        """SVGP closure (reference compute_gp_models_pytorch.py SVGP
        option) end-to-end through the hyper-reduced runner."""
        import run_pod_gp_hprom

        _, err = run_pod_gp_hprom.main(
            4.75, 0.02, num_primary=3, num_secondary=5,
            compute_ecsw=True, bc_w=5.0, retrain=True,
            per_mode="variational", num_inducing=16, **SMALL)
        assert np.isfinite(err) and err < 10.0

    def test_closure_weights_multi_trajectory(self, runner_cwd):
        """closure_ecsw_weights accepts a sequence of training points:
        the row budget is split over the trajectories (stride scales
        with the count), giving a sampled mesh representative of the
        whole mu box (the fine-grid weight recipe,
        scripts/build_fine_weights.py --mu-train spread)."""
        import jax.numpy as jnp

        from common import closure_ecsw_weights, default_config, \
            make_problem
        from finitedifference_tpu.closures.common import Closure

        cfg = default_config(12, 8)
        grid, w0 = make_problem(cfg)
        rng = np.random.default_rng(0)
        u_p = np.linalg.qr(rng.standard_normal((grid.state_dim, 3)))[0]
        u_s = np.linalg.qr(rng.standard_normal((grid.state_dim, 2)))[0]
        zero = Closure(predict=lambda y: jnp.zeros(2),
                       jacobian=lambda y: jnp.zeros((2, 3)))
        w_multi = closure_ecsw_weights(
            cfg, grid, w0, u_p, u_s, zero, weights_path="w_multi.npy",
            bc_w=5.0, mu_train=[(4.25, 0.0225), (4.75, 0.02)],
            compute=True)
        w_single = closure_ecsw_weights(
            cfg, grid, w0, u_p, u_s, zero, weights_path="w_single.npy",
            bc_w=5.0, mu_train=(4.25, 0.0225), compute=True)
        for w in (w_multi, w_single):
            assert w.shape == (grid.n_cells,)
            assert np.all(w >= 0) and (w > 0).sum() > 0

    def test_rnm(self, runner_cwd):
        import run_rnm

        _, err = run_rnm.main(4.75, 0.02, num_primary=3, num_secondary=5,
                              epochs=30, retrain=True, **SMALL)
        assert np.isfinite(err)

    def test_sweep(self, runner_cwd):
        import run_sweep

        elapsed = run_sweep.main(n_mu1=2, n_mu2=1, **SMALL)
        assert elapsed > 0

    def test_tests_driver(self, runner_cwd):
        import run_tests

        results = run_tests.main(models=("prom",), out="rr.npz", **SMALL)
        assert any(k.startswith("prom_") for k in results)
        # skip-if-done on rerun
        n_before = len(results)
        results2 = run_tests.main(models=("prom",), out="rr.npz", **SMALL)
        assert len(results2) == n_before
