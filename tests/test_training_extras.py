"""Extras: Bayesian-opt RBF, anisotropic RBF, SVR closure, sequential
NNLS, missing-snapshot tolerance, derivative slope checks."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from finitedifference_tpu.closures.rbf import rbf_global_predict
from finitedifference_tpu.ecsw import (
    ecsw_training_matrix,
    sequential_nnls_weights,
)
from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.pod import pod
from finitedifference_tpu.snapshots import collect_snapshots
from finitedifference_tpu.training.rbf_train import (
    fit_global_rbf_anisotropic,
    train_global_rbf_bayesian,
    train_svr,
)


def smooth_pairs(n=120, n_p=3, n_s=4, seed=0, stretch=None):
    rng = np.random.default_rng(seed)
    q_p = rng.uniform(-1, 1, size=(n, n_p))
    if stretch is not None:
        q_p = q_p * np.asarray(stretch)
    a = rng.normal(size=(n_p, n_s))
    q_s = np.tanh((q_p / (np.asarray(stretch) if stretch is not None
                          else 1.0)) @ a)
    return q_p, q_s


class TestBayesianRBF:
    def test_finds_good_epsilon(self):
        q_p, q_s = smooth_pairs()
        model, log = train_global_rbf_bayesian(
            q_p, q_s, kernel="gaussian", n_iters=12, n_seed=4)
        assert log["best"]["val_error"] < 0.05
        pred = rbf_global_predict(model, jnp.asarray(q_p[3]))
        assert np.linalg.norm(np.asarray(pred) - q_s[3]) < 0.1


class TestAnisotropicRBF:
    def test_learns_scales(self):
        # one input dimension stretched 10x: isotropic epsilon struggles,
        # anisotropic scales should compensate
        q_p, q_s = smooth_pairs(n=150, stretch=[10.0, 1.0, 1.0])
        model, info = fit_global_rbf_anisotropic(
            q_p, q_s, kernel="gaussian", num_steps=150)
        assert info["val_error"] < 0.1
        pred = rbf_global_predict(model, jnp.asarray(q_p[5]))
        assert np.linalg.norm(np.asarray(pred) - q_s[5]) < 0.15


class TestSVR:
    def test_svr_closure(self):
        q_p, q_s = smooth_pairs(n=150)
        closure, info = train_svr(q_p, q_s, c_grid=(1.0, 10.0))
        assert info["val_error"] < 0.2
        y = jnp.asarray(q_p[4])
        pred = closure.predict(y)
        assert pred.shape == (4,)
        jac = closure.jacobian(y)
        assert jac.shape == (4, 3)
        # jacfwd of the exported decision function is self-consistent
        jac2 = jax.jacfwd(closure.predict)(y)
        np.testing.assert_allclose(np.asarray(jac), np.asarray(jac2),
                                   atol=1e-10)


class TestSequentialNNLS:
    def test_covers_assembly(self):
        grid = Grid2D(nx=10, ny=10, x_up=100.0, y_up=100.0)
        ops, xc = oracle.make_problem(nx=10, ny=10)
        w0 = np.ones(grid.state_dim)
        s1 = oracle.implicit_trajectory(w0, [4.25, 0.0225], 0.05, 14,
                                        ops, xc)
        basis, _ = pod(s1, num_modes=6, method="svd")
        C = np.asarray(ecsw_training_matrix(
            grid, jnp.asarray(s1[:, 3::2]), jnp.asarray(s1[:, 0:-3:2]),
            jnp.asarray(np.asarray(basis)), 4.25, 0.0225, 0.05))
        w = sequential_nnls_weights(C, grid, batch_size=20, bc_w=5.0)
        assert w.shape == (grid.n_cells,)
        assert (w > 0).sum() > 0
        # the weighted assembly approximates the full one
        interior = np.zeros((10, 10), bool)
        interior[1:-1, 1:-1] = True
        Ci = C[:, interior.ravel()]
        d = Ci.sum(axis=1)
        rel = np.linalg.norm(Ci @ w[interior.ravel()] - d) / \
            np.linalg.norm(d)
        assert rel < 0.1


class TestMissingSnapshots:
    def test_allow_missing(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        grid = Grid2D(nx=6, ny=6, x_up=100.0, y_up=100.0)
        w0 = np.ones(grid.state_dim)
        folder = str(tmp_path / "snaps")
        # cache only one of two points
        from finitedifference_tpu.snapshots import load_or_compute_snaps
        load_or_compute_snaps([4.5, 0.02], grid, w0, 0.05, 3,
                              snap_folder=folder)
        out = collect_snapshots([[4.5, 0.02], [5.0, 0.03]], grid, w0,
                                0.05, 3, snap_folder=folder,
                                allow_missing=True)
        assert out.shape == (grid.state_dim, 4)  # only the cached one
        assert os.path.exists("missing_snapshots.log")
        with pytest.raises(FileNotFoundError):
            collect_snapshots([[5.0, 0.03]], grid, w0, 0.05, 3,
                              snap_folder=folder, allow_missing=True)


class TestDerivativeChecker:
    def test_slopes(self):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "runners"))
        import check_derivatives

        results = check_derivatives.main(kernel="imq", verbose=False)
        for name, (slope, min_err, ok) in results.items():
            assert ok, f"{name}: slope {slope}, min err {min_err}"


class TestKNNSearch:
    def test_grid_search(self):
        q_p, q_s = smooth_pairs(n=150)
        from finitedifference_tpu.training.rbf_train import (
            train_knn_rbf_search,
        )
        model, log = train_knn_rbf_search(
            q_p, q_s, epsilons=np.logspace(-1, 0.5, 4),
            neighbor_counts=[10, 30])
        assert log["best"]["val_error"] < 0.1
        assert model.neighbors in (10, 30)


class TestCVGridSearch:
    def test_cv(self):
        q_p, q_s = smooth_pairs(n=120)
        from finitedifference_tpu.training.rbf_train import (
            train_global_rbf_cv,
        )
        model, log = train_global_rbf_cv(
            q_p, q_s, epsilons=np.logspace(-1, 0.5, 4),
            kernels=("gaussian",), n_folds=3)
        assert log["best"]["cv_error"] < 0.1


class TestRNMWithMu:
    def test_mu_closure(self):
        import jax.numpy as jnp
        from finitedifference_tpu.closures.ann import (
            init_rnm,
            rnm_closure_with_mu,
        )
        module, params = init_rnm(q1_size=5, q2_size=7)  # 3 q + 2 mu
        clo = rnm_closure_with_mu(module, params, [4.75, 0.02])
        y = jnp.arange(3.0)
        assert clo.predict(y).shape == (7,)
        assert clo.jacobian(y).shape == (7, 3)


class TestSnapshotDtypeWarning:
    def test_f32_cache_loads_with_warning(self, tmp_path, monkeypatch,
                                          capsys):
        """A cached f32 trajectory read by a full-precision consumer
        must load with a loud warning, not crash (the default `expected`
        dtype is the np.float64 CLASS, which has no .name)."""
        monkeypatch.chdir(tmp_path)
        grid = Grid2D(nx=6, ny=6, x_up=100.0, y_up=100.0)
        w0 = np.ones(grid.state_dim)
        folder = str(tmp_path / "snaps")
        from finitedifference_tpu.snapshots import load_or_compute_snaps
        load_or_compute_snaps([4.5, 0.02], grid, w0, 0.05, 3,
                              snap_folder=folder,
                              snaps_dtype=np.float32)
        out = load_or_compute_snaps([4.5, 0.02], grid, w0, 0.05, 3,
                                    snap_folder=folder)
        assert out.dtype == np.float32
        assert "WARNING" in capsys.readouterr().out
